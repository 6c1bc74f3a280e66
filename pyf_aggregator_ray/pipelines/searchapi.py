"""Unified search entry point — the reference engine's single
``documents.search(search_parameters)`` surface
(``/root/reference/src/pyf/aggregator/db.py:253-430``: every retrieval
in the reference goes through one parameter dict with q / query_by /
filter_by / group_by / sort_by / per_page), mapped onto this engine's
verified components. A user of the reference switches by translating
the parameter dict to keyword arguments:

==================  =====================================================
reference parameter  here
==================  =====================================================
``q``                ``query`` (with ``-term`` negation parsed inline)
``filter_by``        ``filter_by`` — same ``field:=value && ...`` syntax
``group_by``         ``group_by=True`` (collapse to best-per-group)
``num_typos``        ``num_typos`` (0, 1 or 2 — SymSpell artifact path)
``per_page``         ``k``
(hybrid vector)      ``query_vec_id`` — RRF fusion with the embedding
(quoted phrase)      ``phrase=True`` — positional-adjacency match
==================  =====================================================

Each route delegates to the SAME stage classes the oracled pipelines
run in actor pools (one-off calls construct the stage locally; a query
STREAM should go through ``map_batches(Stage, ...)`` like the
pipelines do). Routes are mutually exclusive where the reference's
engine also treats them as distinct search modes.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..config import EngineConfig
from . import query as q
from .registry import ensure_index


def search(
    sf_dir: str,
    query: str,
    *,
    k: int = 10,
    filter_by: str | None = None,
    group_by: bool = False,
    num_typos: int = 0,
    phrase: bool = False,
    query_vec_id: int | None = None,
    cfg: EngineConfig | None = None,
) -> pa.Table:
    """One query through the engine; returns the ranked hits table
    (columns depend on the mode, matching the corresponding oracled
    pipeline's schema)."""
    from ..state import manifest as mf
    from . import hybrid as hy
    from . import registry as reg
    from . import searchplus as sp

    root = ensure_index(sf_dir, cfg)
    batch = pa.table(
        {
            "query_id": pa.array([0], pa.int64()),
            "query": pa.array([query], pa.string()),
            "k": pa.array([k], pa.int64()),
        }
    )

    if phrase:
        vdir = mf.read_alias(root)
        pos = sp.ensure_positions_artifact(sf_dir, vdir)
        return sp.PhraseScorerStage(root, pos, cfg)(batch)

    if query_vec_id is not None:
        text_tbl = hy.HybridTextStage(root, cfg)(batch.drop_columns(["k"]))
        import ray.data

        emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")
        from ..stages import ann as ann_stage

        ann = ann_stage.brute_force_topk(emb, [query_vec_id], hy.FUSE_DEPTH)
        vec_tbl = pa.table(
            {
                "query_id": pa.array([0] * ann.num_rows, pa.int64()),
                "doc_id": ann["vec_id"],
                "vec_rank": ann["rank"],
            }
        )
        return hy._rrf_fuse(text_tbl, vec_tbl, [(0, query, query_vec_id, k)])

    if group_by:
        return sp.GroupedScorerStage(root, cfg=cfg)(batch)

    if filter_by:
        fbatch = batch.append_column(
            "filter_by", pa.array([filter_by], pa.string())
        )
        return sp.FilteredScorerStage(root, cfg)(fbatch)

    if num_typos > 0:
        vdir = mf.read_alias(root)
        from ..functions.tokenizer import tokenize_query

        matches = reg._typo_expand(vdir, {0: tokenize_query(query)}, num_typos)
        expanded = " ".join(sorted(matches[0]))
        if not expanded:
            return pa.schema(
                [("query_id", pa.int64()), ("rank", pa.int64()),
                 ("doc_id", pa.int64()), ("score", pa.float64())]
            ).empty_table()
        query = expanded

    # default: BM25 with inline `-term` negation
    pos_q, neg = sp.parse_negation(query)
    stage = sp.NegationScorerStage(root, cfg)
    if neg:
        return stage(batch.set_column(1, "query", pa.array([query], pa.string())))
    reader = stage.reader
    rows = reader.score(pos_q, k)
    from ..functions.rounding import round6

    return pa.table(
        {
            "query_id": pa.array([0] * len(rows), pa.int64()),
            "rank": pa.array([r for r, _, _ in rows], pa.int64()),
            "doc_id": pa.array([d for _, d, _ in rows], pa.int64()),
            "score": pa.array(
                round6(np.array([s for _, _, s in rows], dtype=np.float64))
            ),
        }
    )
