"""Engine configuration.

The reference exposes its throughput surface as env-tunable knobs
(``/root/reference/src/pyf/aggregator/fetcher.py:47-60``,
``npm_fetcher.py:42-52``); we centralize the analogous knobs in one
dataclass so pipelines, tests and the bench harness share defaults.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field


@dataclass
class EngineConfig:
    # ---- BM25 scoring (north_star: k1=1.2, b=0.75) ----
    k1: float = 1.2
    b: float = 0.75

    # ---- tokenizer ----
    # Reference tokenization separators (db.py:241): [".", "-", "_", "@", "/"]
    # plus whitespace/punctuation. We normalize to: lowercase, token = run of
    # [a-z0-9]. MUST stay in sync with the DuckDB oracle regex in
    # pipelines/query.py (TOKEN_RE_SQL).
    token_pattern: str = "[a-z0-9]+"

    # ---- index build ----
    # Terms with global df above this are "hot" and get salted by doc-id
    # range before the groupby(term) shuffle (north_rule skew handling).
    hot_df_threshold: int = 2_000
    # Width of one doc-id range shard for salting hot terms / resumable
    # partition builds. Group size is bounded by this many docs.
    salt_range_docs: int = 2_000
    # Tokenize stage actor pool. None -> autoscale (2, num_cluster_cpus).
    tokenize_batch_size: int = 2048
    tokenize_concurrency: int | tuple[int, int] | None = None
    # Target rows per output parquet file for postings segments.
    postings_rows_per_file: int = 200_000
    # Append-mode compaction policy: when the live version's max posting
    # rows per term reaches this bound, the next mode="append" increment
    # escalates to a merge-mode compaction (bounds the reader's per-term
    # shard-concat depth — K appends x hot term would otherwise pay a
    # K-way concat+sort per lookup forever).
    append_max_term_shards: int = 8

    # ---- query engine ----
    default_k: int = 10
    score_round_decimals: int = 6  # rounding applied to *reported* scores only

    # ---- enrichment / field weights ----
    # Fold repo size into a document weight multiplier (reference analog of
    # field weights 10,10,5,3,1 — AGENTS.md:16-19). weight = 1 + scale*ln(files).
    repo_weight_scale: float = 0.1

    # ---- paths ----
    index_root: str = field(
        default_factory=lambda: os.environ.get("PYFA_INDEX_ROOT", "/tmp/pyfa_index")
    )

    # ---- dedup ----
    minhash_num_perm: int = 64
    minhash_bands: int = 16  # rows per band = num_perm // bands
    shingle_k: int = 3  # word shingles
    jaccard_threshold: float = 0.5

    # ---- ANN / embedding near-dup ----
    ann_default_k: int = 5
    embedding_cosine_threshold: float = 0.4


DEFAULT = EngineConfig()
