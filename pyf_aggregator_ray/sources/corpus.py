"""Corpus sources.

Primary input shape (per ``BASELINE.json`` ``input_hint``):

    (repo: string, path: string, commit: string, lang: string, content: string)

Two sources:

1. :func:`read_corpus` — deterministically derives the corpus from the
   driver-generated ``documents.parquet`` (``doc_id, text, lang, source,
   n_chars``). The derivation is a pure column mapping, expressible in
   ANSI SQL (see :data:`CORPUS_SQL`) so the DuckDB oracle reconstructs the
   identical corpus. This replaces the reference's HTTP fetch source
   (``/root/reference/src/pyf/aggregator/fetcher.py:315-391`` — list
   package ids; ``fetcher.py:473-563`` — per-package JSON) with a columnar
   Parquet scan: "discovery" is Parquet fragment discovery, per-row fetch
   is subsumed by the scan.

2. :func:`synth_corpus` — a small seeded synthetic corpus for unit tests
   (hot terms in nearly every row for salting tests, rare unique tokens,
   empty and non-ASCII rows, multi-commit files for newest-wins paths).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

import ray.data

from ..functions.hashing import sha256_column

_EXT = {"en": "py", "fr": "js", "es": "md", "de": "rs", "zh": "go"}

# SQL fragment (DuckDB) that reconstructs the same corpus from the
# pre-registered `documents` view. MUST stay in sync with derive_batch().
CORPUS_SQL = """
SELECT
  doc_id,
  'org/' || source AS repo,
  printf('src/%s/doc_%06d.%s', lang, doc_id,
         CASE lang WHEN 'en' THEN 'py' WHEN 'fr' THEN 'js'
                   WHEN 'es' THEN 'md' WHEN 'de' THEN 'rs'
                   ELSE 'go' END) AS path,
  md5('org/' || source || '/' ||
      printf('src/%s/doc_%06d.%s', lang, doc_id,
             CASE lang WHEN 'en' THEN 'py' WHEN 'fr' THEN 'js'
                       WHEN 'es' THEN 'md' WHEN 'de' THEN 'rs'
                       ELSE 'go' END))
    || substr(md5('org/' || source || '/' ||
      printf('src/%s/doc_%06d.%s', lang, doc_id,
             CASE lang WHEN 'en' THEN 'py' WHEN 'fr' THEN 'js'
                       WHEN 'es' THEN 'md' WHEN 'de' THEN 'rs'
                       ELSE 'go' END)), 1, 8) AS commit,
  lang,
  text AS content
FROM documents
"""


def derive_batch(batch: pa.Table) -> pa.Table:
    """documents batch -> corpus batch (pure, deterministic, SQL-mirrored)."""
    doc_id = batch["doc_id"].combine_chunks() if isinstance(
        batch["doc_id"], pa.ChunkedArray
    ) else batch["doc_id"]
    ids = doc_id.to_numpy(zero_copy_only=False)
    langs = batch["lang"].to_pylist()
    sources = batch["source"].to_pylist()
    repos = [f"org/{s}" for s in sources]
    paths = [
        f"src/{lang}/doc_{i:06d}.{_EXT.get(lang, 'go')}"
        for i, lang in zip(ids, langs)
    ]
    commits = []
    for r, p in zip(repos, paths):
        h = hashlib.md5(f"{r}/{p}".encode()).hexdigest()
        commits.append(h + h[:8])
    return pa.table(
        {
            "doc_id": pa.array(ids, type=pa.int64()),
            "repo": pa.array(repos, type=pa.string()),
            "path": pa.array(paths, type=pa.string()),
            "commit": pa.array(commits, type=pa.string()),
            "lang": batch["lang"],
            "content": batch["text"],
        }
    )


def _default_blocks() -> int | None:
    """Split single-file reads into ~2 blocks per CPU so map stages get
    parallelism even from one parquet file (at the 10^12-file design point
    the input is already thousands of fragments and this is a no-op)."""
    import ray

    if not ray.is_initialized():
        return None
    return max(8, 2 * int(ray.cluster_resources().get("CPU", 4)))


def read_corpus(
    sf_dir: str,
    *,
    with_sha256: bool = False,
    override_num_blocks: int | None = None,
) -> ray.data.Dataset:
    """Read ``{sf_dir}/documents.parquet`` and derive the corpus Dataset.

    Column pruning happens at the read (only the 4 needed columns leave
    the parquet file). ``with_sha256`` appends the per-row content
    invariant column.
    """
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text", "lang", "source"],
        override_num_blocks=override_num_blocks or _default_blocks(),
    )
    ds = ds.map_batches(derive_batch, batch_format="pyarrow")
    if with_sha256:
        ds = ds.map_batches(
            lambda t: t.append_column("sha256", sha256_column(t["content"])),
            batch_format="pyarrow",
        )
    return ds


def read_corpus_amplified(sf_dir: str, factor: int) -> ray.data.Dataset:
    """Deterministically amplify the corpus ``factor``x for throughput /
    scaling benchmarks: replica k re-derives every document with
    ``doc_id + k*N`` (distinct ids, paths, commits; identical content).
    Same input for every parallelism level -> a fair scaling comparison.

    Replication happens INSIDE map_batches (one read, blocks stay large);
    a union of ``factor`` re-reads would fragment the dataset into
    thousands of tiny blocks whose per-task overhead dominates wall time.
    """
    import pyarrow.parquet as pq

    n = pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows

    def amplify(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        replicas = []
        for k in range(factor):
            replicas.append(
                t.set_column(
                    t.schema.get_field_index("doc_id"),
                    "doc_id",
                    pa.array(ids + k * n, type=pa.int64()),
                )
            )
        return pa.concat_tables(replicas)

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text", "lang", "source"],
        override_num_blocks=_default_blocks(),
    )
    return ds.map_batches(amplify, batch_format="pyarrow").map_batches(
        derive_batch, batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# synthetic unit-test corpus (FIXTURES.md §1)
# ---------------------------------------------------------------------------

_HOT = ["import", "def", "self", "return"]
_MID = [f"ident{i}" for i in range(40)]
_LANGS = ["python", "javascript", "markdown", "text"]


def synth_corpus(n_rows: int = 200, seed: int = 42) -> pa.Table:
    """Seeded synthetic corpus table (Arrow) for unit tests only.

    Hot terms appear in almost every row (Zipf head); ``rare{i}`` tokens
    are unique one-posting terms; includes empty content, non-ASCII, and
    1-3 commits per (repo, path).
    """
    rng = np.random.default_rng(seed)
    rows = {k: [] for k in ("repo", "path", "commit", "lang", "content")}
    for i in range(n_rows):
        repo = f"org{rng.integers(0, 5)}/proj{rng.integers(0, 4)}"
        path = f"src/pkg/mod_{rng.integers(0, max(4, n_rows // 4))}.py"
        commit = hashlib.sha1(f"{repo}/{path}/{i}".encode()).hexdigest()
        lang = _LANGS[int(rng.integers(0, len(_LANGS)))]
        if i % 37 == 0:
            content = ""
        elif i % 23 == 0:
            content = f"café naïve 中文 {rng.integers(0, 9)} import"
        else:
            words = []
            for _ in range(int(rng.integers(5, 60))):
                r = rng.random()
                if r < 0.45:
                    words.append(_HOT[int(rng.integers(0, len(_HOT)))])
                elif r < 0.9:
                    words.append(_MID[int(rng.integers(0, len(_MID)))])
                else:
                    words.append(f"rare{i}_{int(rng.integers(0, 3))}")
            content = " ".join(words)
        rows["repo"].append(repo)
        rows["path"].append(path)
        rows["commit"].append(commit)
        rows["lang"].append(lang)
        rows["content"].append(content)
    t = pa.table(rows)
    doc_id = pa.array(np.arange(n_rows, dtype=np.int64))
    return t.add_column(0, "doc_id", doc_id)
