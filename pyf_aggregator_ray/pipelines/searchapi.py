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
    page: int = 1,
    filter_by: str | None = None,
    group_by: bool = False,
    num_typos: int = 0,
    sort_by: str = "score",
    phrase: bool = False,
    query_vec_id: int | None = None,
    include_snippets: bool = False,
    cfg: EngineConfig | None = None,
) -> pa.Table:
    """One query through the engine; returns the ranked hits table.

    The composed default path returns (query_id, rank, repo, doc_id,
    score, dl); the phrase and hybrid modes return their dedicated
    pipelines' schemas. ``page`` is the reference's ``per_page`` + ``page``
    pagination (``db.py:266-290,377-401``): 1-based, window of ``k`` rows,
    ranks stay global. ``include_snippets`` attaches per-hit highlights
    (first_pos, snippet) — the reference returns Typesense
    ``highlight_*`` fields with every hit — to composed and phrase
    results."""
    from ..state import manifest as mf
    from . import hybrid as hy
    from . import searchplus as sp

    if sort_by not in ("score", "dl"):
        raise ValueError(f"sort_by must be 'score' or 'dl', got {sort_by!r}")
    if num_typos not in (0, 1, 2):
        raise ValueError(f"num_typos must be 0, 1 or 2, got {num_typos!r}")
    if page < 1:
        raise ValueError(f"page must be >= 1, got {page!r}")

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
                ("sort_by", sort_by != "score"), ("page", page != 1),
                ("include_snippets", include_snippets),
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

        # pagination by slicing the ranked prefix: score to depth
        # page*k, keep the window (ranks stay global)
        rows = stage.reader.score(query, page * k, allowed_ids=allowed)[
            (page - 1) * k :
        ]
        out = pa.table(
            {
                "query_id": pa.array([0] * len(rows), pa.int64()),
                "rank": pa.array([r for r, _, _ in rows], pa.int64()),
                "doc_id": pa.array([d for _, d, _ in rows], pa.int64()),
                "score": pa.array(
                    round6(np.array([s for _, _, s in rows], dtype=np.float64))
                ),
            }
        )
        if include_snippets:
            from ..functions.tokenizer import tokenize_query

            out = attach_snippets(sf_dir, out, tokenize_query(query))
        return out

    # composed default: filter + group + typo + sort + inline negation
    # around one scorer pass
    stage = sp.ComposableScorerStage(root, cfg)
    rows = stage.run_one(
        query, k, filter_by or "", group_by, num_typos, sort_by, page
    )
    from ..functions.rounding import round6

    out = pa.table(
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
    if include_snippets:
        from ..functions.tokenizer import tokenize_query
        from .searchplus import parse_negation

        positive, _neg = parse_negation(query)
        if num_typos > 0:
            positive = stage._expand_typos(positive, num_typos)
        out = attach_snippets(sf_dir, out, tokenize_query(positive))
    return out


SNIPPET_LEN = 40


def attach_snippets(
    sf_dir: str, hits: pa.Table, terms: list[str], snippet_len: int = SNIPPET_LEN
) -> pa.Table:
    """Append (first_pos, snippet) highlight columns to a hits table —
    the reference returns Typesense ``highlight_*`` fields on every
    search hit. ``first_pos`` is the 1-based position of the earliest
    occurrence of any query term in the hit's text (0 when no term
    occurs as a substring, e.g. after typo expansion matched a variant);
    the snippet is a fixed-width slice from it. Only the HIT docs' texts
    are read (pushdown filter on doc_id — content never ships for
    non-hits; same contract as registry.bm25_snippets)."""
    import pyarrow.dataset as pads

    if hits.num_rows == 0:
        return hits.append_column(
            "first_pos", pa.array([], pa.int64())
        ).append_column("snippet", pa.array([], pa.string()))
    ids = sorted({int(d) for d in hits["doc_id"].to_pylist()})
    texts = pads.dataset(f"{sf_dir}/documents.parquet").to_table(
        columns=["doc_id", "text"], filter=pads.field("doc_id").isin(ids)
    )
    tmap = dict(zip(texts["doc_id"].to_pylist(), texts["text"].to_pylist()))
    poss, snips = [], []
    for d in hits["doc_id"].to_pylist():
        text = tmap.get(int(d), "") or ""
        low = text.lower()
        cand = [p for p in (low.find(t) + 1 for t in terms) if p > 0]
        first = min(cand) if cand else 0
        poss.append(first)
        snips.append(text[first - 1 : first - 1 + snippet_len] if first else "")
    return hits.append_column(
        "first_pos", pa.array(poss, type=pa.int64())
    ).append_column("snippet", pa.array(snips, type=pa.string()))
