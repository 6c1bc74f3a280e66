"""Unified search() facade: every routed mode must agree with the
dedicated (oracle-verified) pipeline it delegates to."""

import numpy as np
import pyarrow as pa

from pyf_aggregator_ray.pipelines.searchapi import search

SF = "/root/testdata/sf0.001"


def test_plain_bm25_route(ray_session):
    from pyf_aggregator_ray.pipelines.query import IndexReader
    from pyf_aggregator_ray.pipelines.registry import ensure_index

    out = search(SF, "merge sort", k=10).to_pandas()
    reader = IndexReader(ensure_index(SF))
    want = reader.score("merge sort", 10)
    assert out.doc_id.tolist() == [d for _, d, _ in want]
    assert out["rank"].tolist() == [r for r, _, _ in want]


def test_negation_route(ray_session):
    out = search(SF, "merge sort -python", k=10).to_pandas()
    from pyf_aggregator_ray.pipelines.registry import ensure_index
    from pyf_aggregator_ray.pipelines.searchplus import NegationScorerStage

    stage = NegationScorerStage(ensure_index(SF))
    excl = set(stage._excluded_ids(["python"]).tolist())
    assert len(out) > 0
    assert not (set(out.doc_id) & excl)


def test_filter_route(ray_session):
    out = search(SF, "merge sort", k=10, filter_by="lang:=en").to_pandas()
    from pyf_aggregator_ray.pipelines.registry import ensure_index
    from pyf_aggregator_ray.pipelines.searchplus import FilteredScorerStage

    stage = FilteredScorerStage(ensure_index(SF))
    allowed = set(stage._allowed_ids("lang:=en").tolist())
    assert len(out) > 0
    assert set(out.doc_id) <= allowed


def test_group_route(ray_session):
    out = search(SF, "customer value", k=5, group_by=True).to_pandas()
    assert out["repo"].is_unique
    assert len(out) <= 5


def test_phrase_route(ray_session):
    from pyf_aggregator_ray.pipelines.registry import ensure_index
    from pyf_aggregator_ray.pipelines.searchplus import (
        PhraseScorerStage,
        ensure_positions_artifact,
    )
    from pyf_aggregator_ray.state import manifest as mf

    out = search(SF, "merge sort", k=10, phrase=True).to_pandas()
    root = ensure_index(SF)
    vdir = mf.read_alias(root)
    stage = PhraseScorerStage(root, ensure_positions_artifact(SF, vdir))
    matching = set(stage.match_docs("merge sort").tolist())
    assert len(out) > 0
    assert set(out.doc_id) <= matching


def test_typo_route(ray_session):
    # "mergw" is distance-1 from "merge": the typo route must return
    # hits, the exact route none
    assert len(search(SF, "mergw", k=5).to_pandas()) == 0
    out = search(SF, "mergw", k=5, num_typos=1).to_pandas()
    assert len(out) > 0


def test_composed_filter_group_sort(ray_session):
    """The reference's real parameter space (db.py:267-275): filter +
    group + sort_by in ONE call — groups unique, every hit passes the
    filter, ordering follows the sort field."""
    from pyf_aggregator_ray.pipelines.registry import ensure_index
    from pyf_aggregator_ray.pipelines.searchplus import FilteredScorerStage

    out = search(
        SF, "the", k=5, filter_by="lang:=en", group_by=True, sort_by="dl"
    ).to_pandas()
    assert len(out) > 0
    assert out["repo"].is_unique
    allowed = set(
        FilteredScorerStage(ensure_index(SF))._allowed_ids("lang:=en").tolist()
    )
    assert set(out.doc_id) <= allowed
    assert out["dl"].is_monotonic_decreasing


def test_composed_typo_filter(ray_session):
    """num_typos + filter_by in one call: 'mergw' expands to 'merge'
    and the filter still restricts the hits."""
    from pyf_aggregator_ray.pipelines.registry import ensure_index
    from pyf_aggregator_ray.pipelines.searchplus import FilteredScorerStage

    out = search(SF, "mergw", k=10, num_typos=1, filter_by="lang:=en").to_pandas()
    assert len(out) > 0
    allowed = set(
        FilteredScorerStage(ensure_index(SF))._allowed_ids("lang:=en").tolist()
    )
    assert set(out.doc_id) <= allowed


def test_composed_negation_group(ray_session):
    """Inline -term negation composes with group_by."""
    from pyf_aggregator_ray.pipelines.registry import ensure_index
    from pyf_aggregator_ray.pipelines.searchplus import NegationScorerStage

    out = search(SF, "merge sort -python", k=10, group_by=True).to_pandas()
    excl = set(
        NegationScorerStage(ensure_index(SF))._excluded_ids(["python"]).tolist()
    )
    assert len(out) > 0
    assert out["repo"].is_unique
    assert not (set(out.doc_id) & excl)


def test_phrase_composes_with_filter(ray_session):
    from pyf_aggregator_ray.pipelines.registry import ensure_index
    from pyf_aggregator_ray.pipelines.searchplus import (
        FilteredScorerStage,
        PhraseScorerStage,
        ensure_positions_artifact,
    )
    from pyf_aggregator_ray.state import manifest as mf

    out = search(SF, "merge sort", k=10, phrase=True, filter_by="lang:=en").to_pandas()
    root = ensure_index(SF)
    stage = PhraseScorerStage(root, ensure_positions_artifact(SF, mf.read_alias(root)))
    matching = set(stage.match_docs("merge sort").tolist())
    allowed = set(FilteredScorerStage(root)._allowed_ids("lang:=en").tolist())
    assert set(out.doc_id) <= (matching & allowed)
    # and the filter actually bites vs the unfiltered phrase search
    unfiltered = search(SF, "merge sort", k=10, phrase=True).to_pandas()
    assert len(out) <= len(unfiltered)


def test_unsupported_combinations_raise(ray_session):
    import pytest as _pytest

    with _pytest.raises(ValueError):
        search(SF, "merge", k=5, phrase=True, num_typos=1)
    with _pytest.raises(ValueError):
        search(SF, "merge", k=5, phrase=True, group_by=True)
    with _pytest.raises(ValueError):
        search(SF, "merge", k=5, query_vec_id=0, filter_by="lang:=en")
    with _pytest.raises(ValueError):
        search(SF, "merge", k=5, query_vec_id=0, group_by=True)
    with _pytest.raises(ValueError):
        search(SF, "merge", k=5, sort_by="bogus")
    with _pytest.raises(ValueError):
        search(SF, "merge", k=5, num_typos=7)


def test_hybrid_route(ray_session):
    from pyf_aggregator_ray.pipelines.hybrid import (
        HYBRID_QUERIES,
        hybrid_search,
    )

    qid, text, qvec, k = HYBRID_QUERIES[0]
    out = search(SF, text, k=k, query_vec_id=qvec).to_pandas()
    want = hybrid_search(SF).to_pandas()
    want = want[want.query_id == qid].reset_index(drop=True)
    assert out.doc_id.tolist() == want.doc_id.tolist()
    assert (out.score.to_numpy() == want.score.to_numpy()).all()


def test_pagination_window(ray_session):
    """page=2 returns exactly rows k+1..2k of the page-1-at-2k ranking,
    with GLOBAL ranks (reference per_page+page pagination)."""
    full = search(SF, "the", k=10).to_pandas()
    p1 = search(SF, "the", k=5, page=1).to_pandas()
    p2 = search(SF, "the", k=5, page=2).to_pandas()
    assert p1.doc_id.tolist() == full.doc_id.tolist()[:5]
    assert p2.doc_id.tolist() == full.doc_id.tolist()[5:10]
    assert p2["rank"].tolist() == [6, 7, 8, 9, 10]
    # past-the-end page is empty, not an error
    assert len(search(SF, "the", k=10_000, page=5).to_pandas()) == 0
    import pytest as _pytest

    with _pytest.raises(ValueError):
        search(SF, "the", k=5, page=0)


def test_pagination_composes(ray_session):
    """page composes with filter_by and group_by around the same ranked
    array (the window slices the composed ranking)."""
    full = search(SF, "the", k=20, filter_by="lang:=en", group_by=True).to_pandas()
    p2 = search(SF, "the", k=3, page=2, filter_by="lang:=en", group_by=True).to_pandas()
    assert p2.doc_id.tolist() == full.doc_id.tolist()[3:6]
    assert p2["rank"].tolist() == [4, 5, 6]


def test_phrase_pagination(ray_session):
    full = search(SF, "merge sort", k=20, phrase=True).to_pandas()
    if len(full) > 2:
        k = max(1, len(full) // 2)
        p2 = search(SF, "merge sort", k=k, page=2, phrase=True).to_pandas()
        assert p2.doc_id.tolist() == full.doc_id.tolist()[k : 2 * k]


def test_snippets_attach(ray_session):
    """include_snippets appends (first_pos, snippet) highlight columns;
    positions are 1-based first term occurrences, snippet slices match
    the document text (same contract as the oracle-verified
    bm25_snippets)."""
    import pyarrow.dataset as pads

    out = search(SF, "merge sort", k=5, include_snippets=True).to_pandas()
    assert {"first_pos", "snippet"} <= set(out.columns)
    assert len(out) > 0
    texts = pads.dataset(f"{SF}/documents.parquet").to_table(
        columns=["doc_id", "text"],
        filter=pads.field("doc_id").isin(out.doc_id.tolist()),
    )
    tmap = dict(zip(texts["doc_id"].to_pylist(), texts["text"].to_pylist()))
    for _, r in out.iterrows():
        text = tmap[r.doc_id]
        low = text.lower()
        want = [p for p in (low.find(t) + 1 for t in ("merge", "sort")) if p > 0]
        assert r.first_pos == min(want)
        assert r.snippet == text[r.first_pos - 1 : r.first_pos - 1 + 40]


def test_snippets_compose_with_typo_and_phrase(ray_session):
    # typo route: the expanded term set drives the highlight
    out = search(SF, "mergw", k=5, num_typos=1, include_snippets=True).to_pandas()
    assert len(out) > 0
    assert (out.first_pos > 0).any()
    # phrase route carries the columns too
    ph = search(SF, "merge sort", k=5, phrase=True, include_snippets=True).to_pandas()
    assert {"first_pos", "snippet"} <= set(ph.columns)


def test_snippets_agree_with_bm25_snippets_entry(ray_session):
    """The facade's attached highlights equal the standalone
    oracle-verified bm25_snippets pipeline rows for the same query."""
    from pyf_aggregator_ray.pipelines.registry import (
        SNIPPET_QUERY_IDS,
        bm25_snippets,
    )
    from pyf_aggregator_ray.pipelines.query import QUERY_SET

    ref = bm25_snippets(SF).to_pandas()
    qid = SNIPPET_QUERY_IDS[0]
    query, k = next((t, k) for i, t, k in QUERY_SET if i == qid)
    out = search(SF, query, k=k, include_snippets=True).to_pandas()
    sub = ref[ref.query_id == qid].reset_index(drop=True)
    assert out.doc_id.tolist() == sub.doc_id.tolist()
    assert out.first_pos.tolist() == sub.first_pos.tolist()
    assert out.snippet.tolist() == sub.snippet.tolist()
