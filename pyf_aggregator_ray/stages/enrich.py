"""Enrichment: repo/lang stats joined back as document field weights.

Mirror of the reference's enrichment passes (GitHub stats
``/root/reference/src/pyf/aggregator/enrichers/github.py:157-297``,
downloads ``enrichers/downloads.py:52-99``, health scores
``enrichers/health_calculator.py:104-223``): derive a small per-key stats
table from the corpus itself (groupby repo / lang — a small shuffle),
broadcast it, and fold it into a per-document weight column — the analog
of the reference's weighted search fields (weights 10,10,5,3,1,
``AGENTS.md:16-19``) — which the BM25 scorer multiplies into the final
score (pipelines/query.py ``doc_weights``).

Weight formula (identical in SQL oracle):  w = round6(1 + scale*ln(files)).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data
from ray.data.aggregate import Count, Sum

from ..config import DEFAULT, EngineConfig
from ..functions.rounding import round6


def repo_stats(corpus: ray.data.Dataset) -> ray.data.Dataset:
    """(repo, file_count, total_chars) — partial per-batch pre-aggregation
    inside map_batches, then the small groupby (partial+final pattern)."""

    def partial(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        chars = pc.cast(pc.utf8_length(t["content"]), pa.int64())
        tt = pa.table({"repo": t["repo"], "chars": chars})
        out = tt.group_by("repo", use_threads=False).aggregate(
            [("chars", "count"), ("chars", "sum")]
        )
        return out.rename_columns(["repo", "fc_part", "chars_part"])

    return (
        corpus.map_batches(partial, batch_format="pyarrow")
        .groupby("repo")
        .aggregate(
            Sum("fc_part", alias_name="file_count"),
            Sum("chars_part", alias_name="total_chars"),
        )
    )


def lang_stats(corpus: ray.data.Dataset) -> ray.data.Dataset:
    return corpus.groupby("lang").aggregate(Count(alias_name="file_count"))


def repo_weight_map(
    corpus: ray.data.Dataset, cfg: EngineConfig | None = None
) -> dict[str, float]:
    """repo -> weight, from the stats table (small; safe to hold)."""
    cfg = cfg or DEFAULT
    out: dict[str, float] = {}
    for ref in repo_stats(corpus).to_arrow_refs():
        t = ray.get(ref)
        if not t.num_rows:
            continue
        for repo, fc in zip(
            t["repo"].to_pylist(), t["file_count"].to_pylist()
        ):
            out[repo] = round6(1.0 + cfg.repo_weight_scale * np.log(fc))
    return out


def doc_weights_table(
    corpus: ray.data.Dataset, cfg: EngineConfig | None = None
) -> ray.data.Dataset:
    """(doc_id, repo, weight) — broadcast join of the weight map onto every
    document (ray.put once, dict lookup per batch; never re-shipped)."""
    cfg = cfg or DEFAULT
    wmap = repo_weight_map(corpus, cfg)
    # broadcast as an indexed Series: per-batch lookup is one vectorized
    # hash reindex, not a per-row dict probe
    wref = ray.put(pd.Series(wmap, dtype=np.float64))

    def join(t: pa.Table) -> pa.Table:
        w = ray.get(wref)
        repos = t["repo"].to_numpy(zero_copy_only=False)
        weights = w.reindex(repos).fillna(1.0).to_numpy()
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "repo": t["repo"],
                "weight": pa.array(weights, type=pa.float64()),
            }
        )

    return corpus.map_batches(join, batch_format="pyarrow")
