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
``sort_by``          ``sort_by`` — 'score' (relevance) or 'dl' (field)
``per_page``         ``k``
(hybrid vector)      ``query_vec_id`` — RRF fusion with the embedding
(quoted phrase)      ``phrase=True`` — positional-adjacency match
==================  =====================================================

COMPOSITION (the reference's real parameter space — e.g. grouped +
sorted + filtered in one request, ``db.py:267-275``): ``filter_by``,
``group_by``, ``num_typos``, ``sort_by`` and inline ``-term`` negation
all combine around ONE scorer pass (``ComposableScorerStage``);
``phrase=True`` additionally composes with ``filter_by`` (the phrase
match set intersects the filter's allowed ids). The two genuinely
distinct retrieval modes raise ``ValueError`` on unsupported
combinations instead of silently dropping parameters:

* ``query_vec_id`` (hybrid RRF) fuses two rank lists — grouping,
  filtering, typo expansion and field sorting of the fused list are
  not defined by the engine and are rejected.
* ``phrase=True`` fixes the term sequence — typo expansion, grouping
  and field sorting are rejected.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..config import EngineConfig
from . import query as q
from .registry import ensure_index

_COMPOSED_SCHEMA = pa.schema(
    [("query_id", pa.int64()), ("rank", pa.int64()), ("repo", pa.string()),
     ("doc_id", pa.int64()), ("score", pa.float64()), ("dl", pa.int64())]
)


def search(
    sf_dir: str,
    query: str,
    *,
    k: int = 10,
    filter_by: str | None = None,
    group_by: bool = False,
    num_typos: int = 0,
    sort_by: str = "score",
    phrase: bool = False,
    query_vec_id: int | None = None,
    cfg: EngineConfig | None = None,
) -> pa.Table:
    """One query through the engine; returns the ranked hits table.

    The composed default path returns (query_id, rank, repo, doc_id,
    score, dl); the phrase and hybrid modes return their dedicated
    pipelines' schemas."""
    from ..state import manifest as mf
    from . import hybrid as hy
    from . import searchplus as sp

    if sort_by not in ("score", "dl"):
        raise ValueError(f"sort_by must be 'score' or 'dl', got {sort_by!r}")
    if num_typos not in (0, 1, 2):
        raise ValueError(f"num_typos must be 0, 1 or 2, got {num_typos!r}")

    root = ensure_index(sf_dir, cfg)
    batch = pa.table(
        {
            "query_id": pa.array([0], pa.int64()),
            "query": pa.array([query], pa.string()),
            "k": pa.array([k], pa.int64()),
        }
    )

    if query_vec_id is not None:
        unsupported = [
            name
            for name, on in [
                ("filter_by", filter_by), ("group_by", group_by),
                ("num_typos", num_typos), ("phrase", phrase),
                ("sort_by", sort_by != "score"),
            ]
            if on
        ]
        if unsupported:
            raise ValueError(
                f"query_vec_id (hybrid RRF) does not combine with {unsupported}"
            )
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

    if phrase:
        unsupported = [
            name
            for name, on in [
                ("group_by", group_by), ("num_typos", num_typos),
                ("sort_by", sort_by != "score"),
            ]
            if on
        ]
        if unsupported:
            raise ValueError(f"phrase=True does not combine with {unsupported}")
        vdir = mf.read_alias(root)
        pos = sp.ensure_positions_artifact(sf_dir, vdir)
        nw = sp.ensure_nextword_artifact(sf_dir, vdir)
        stage = sp.PhraseScorerStage(root, pos, cfg, nw)
        allowed = stage.match_docs(query)
        if filter_by:
            # compose: phrase match set ∩ filter's allowed ids (both
            # sorted int64) — filter semantics before ranking, as in the
            # composed default path
            helper = sp.FilteredScorerStage(root, cfg)
            allowed = np.intersect1d(
                allowed, helper._allowed_ids(filter_by), assume_unique=True
            )
        from ..functions.rounding import round6

        rows = stage.reader.score(query, k, allowed_ids=allowed)
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

    # composed default: filter + group + typo + sort + inline negation
    # around one scorer pass
    stage = sp.ComposableScorerStage(root, cfg)
    rows = stage.run_one(query, k, filter_by or "", group_by, num_typos, sort_by)
    from ..functions.rounding import round6

    return pa.table(
        {
            "query_id": pa.array([0] * len(rows), pa.int64()),
            "rank": pa.array([r for r, *_ in rows], pa.int64()),
            "repo": pa.array([g for _, g, *_ in rows], pa.string()),
            "doc_id": pa.array([d for _, _, d, *_ in rows], pa.int64()),
            "score": pa.array(
                round6(np.array([s for _, _, _, s, _ in rows], dtype=np.float64))
            ),
            "dl": pa.array([dl for *_, dl in rows], pa.int64()),
        },
        schema=_COMPOSED_SCHEMA,
    )
