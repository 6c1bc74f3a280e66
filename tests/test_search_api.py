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
