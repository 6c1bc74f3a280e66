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

    def __call__(self, batch: pa.Table) -> pa.Table:
        tokens = tokenize_column(batch["content"])
        dl = doc_lengths(tokens).to_numpy(zero_copy_only=False)
        tf_tbl = term_frequencies(tokens, batch["doc_id"])
        # attach per-doc length to each token row (inline dl keeps BM25
        # scoring self-contained per posting list)
        ids = np.asarray(batch["doc_id"].to_numpy(zero_copy_only=False), dtype=np.int64)
        order = np.argsort(ids, kind="stable")
        pos = np.searchsorted(ids[order], tf_tbl["doc_id"].to_numpy(zero_copy_only=False))
        dls = dl[order][pos]
        return tf_tbl.append_column("dl", pa.array(dls, type=pa.int64()))


DOCS_SCHEMA = pa.schema(
    [("doc_id", pa.int64()), ("repo", pa.string()), ("path", pa.string()),
     ("commit", pa.string()), ("lang", pa.string()), ("dl", pa.int64()),
     ("sha256", pa.string())]
)


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
