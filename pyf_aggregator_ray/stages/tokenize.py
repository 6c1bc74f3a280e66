"""Tokenize stage: corpus batches -> (term, doc_id, tf, dl) token rows.

The analog of the reference's per-document plugin transform chain
(``/root/reference/src/pyf/aggregator/plugins/__init__.py:12-27``): an
ordered chain of transforms composed ONCE per actor in ``__init__`` (the
reference slice-assigns its module-level ``PLUGINS`` list so long-lived
workers don't stack it) and applied per batch in ``__call__``. Run as

    corpus.map_batches(TokenizeStage, batch_format="pyarrow",
                       concurrency=(2, 8), batch_size=cfg.tokenize_batch_size)

so analyzer state lives once per actor, not once per batch.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..config import DEFAULT, EngineConfig
from ..functions.tokenizer import doc_lengths, term_frequencies, tokenize_column


class TokenizeStage:
    """Stateful actor-pool stage: content -> exact per-doc term frequencies."""

    def __init__(self, cfg: EngineConfig | None = None):
        # once-per-actor setup (reference pattern ST1/ST6: plugin chain and
        # pooled sessions built at worker init, fetcher.py:94-103)
        self.cfg = cfg or DEFAULT

    @staticmethod
    def _tf_rows(batch: pa.Table, tokens, dl: np.ndarray) -> pa.Table:
        """(term, doc_id, tf) rows with the per-doc length attached to
        each token row (inline dl keeps BM25 scoring self-contained per
        posting list)."""
        tf_tbl = term_frequencies(tokens, batch["doc_id"])
        ids = np.asarray(batch["doc_id"].to_numpy(zero_copy_only=False), dtype=np.int64)
        order = np.argsort(ids, kind="stable")
        pos = np.searchsorted(ids[order], tf_tbl["doc_id"].to_numpy(zero_copy_only=False))
        dls = dl[order][pos]
        return tf_tbl.append_column("dl", pa.array(dls, type=pa.int64()))

    def __call__(self, batch: pa.Table) -> pa.Table:
        tokens = tokenize_column(batch["content"])
        dl = doc_lengths(tokens).to_numpy(zero_copy_only=False)
        return self._tf_rows(batch, tokens, dl)


DOCS_SCHEMA = pa.schema(
    [("doc_id", pa.int64()), ("repo", pa.string()), ("path", pa.string()),
     ("commit", pa.string()), ("lang", pa.string()), ("dl", pa.int64()),
     ("sha256", pa.string())]
)


class TokenizeAndMetaStage(TokenizeStage):
    """Single-pass build stage: emits token rows AND side-writes each
    batch's doc-meta parquet (doc_id, repo, ..., dl, sha256) into
    ``docs_dir`` — one corpus read+tokenize instead of two (at the
    10^12-file design point the second full corpus scan is the single
    largest avoidable cost in the two-pass build).

    Idempotency: the file name is derived from the batch's min doc_id
    (batches partition disjoint doc-id sets, so names are unique within
    an execution and STABLE across Ray task retries, which replay the
    same input block); writes go to a temp name + atomic rename so a
    mid-write crash never leaves a torn file. build_index clears the
    docs dir before executing, so stale files from an abandoned earlier
    attempt (whose batch boundaries may differ) cannot duplicate rows.
    """

    def __init__(self, cfg=None, docs_dir: str | None = None):
        super().__init__(cfg)
        self.docs_dir = docs_dir

    def __call__(self, batch: pa.Table) -> pa.Table:
        tokens = tokenize_column(batch["content"])
        dl = doc_lengths(tokens).to_numpy(zero_copy_only=False)
        if self.docs_dir is not None and batch.num_rows:
            import os
            import pyarrow.parquet as pq

            from ..functions.hashing import sha256_column

            meta = pa.table(
                {
                    "doc_id": batch["doc_id"],
                    "repo": batch["repo"],
                    "path": batch["path"],
                    "commit": batch["commit"],
                    "lang": batch["lang"],
                    "dl": pa.array(dl, type=pa.int64()),
                    "sha256": sha256_column(batch["content"]),
                }
            ).cast(DOCS_SCHEMA)
            min_id = int(
                np.min(batch["doc_id"].to_numpy(zero_copy_only=False))
            )
            final = os.path.join(self.docs_dir, f"meta-{min_id:012d}.parquet")
            # temp file lives OUTSIDE the artifact dir (a torn .tmp left
            # by a killed task must never be visible to directory reads),
            # then atomic same-filesystem rename into place
            tmp = os.path.join(
                os.path.dirname(self.docs_dir),
                f".meta-tmp-{os.getpid()}-{min_id}",
            )
            pq.write_table(meta, tmp)
            os.replace(tmp, final)
        return self._tf_rows(batch, tokens, dl)


def doc_meta_batch(batch: pa.Table) -> pa.Table:
    """Corpus batch -> document metadata (doc_id, repo, path, commit, lang,
    dl, sha256). The sha256 column is the north-rule per-row invariant."""
    from ..functions.hashing import sha256_column

    tokens = tokenize_column(batch["content"])
    cols = {
        "doc_id": batch["doc_id"],
        "repo": batch["repo"],
        "path": batch["path"],
        "commit": batch["commit"],
        "lang": batch["lang"],
        "dl": doc_lengths(tokens),
        "sha256": sha256_column(batch["content"]),
    }
    return pa.table(cols).cast(DOCS_SCHEMA)
