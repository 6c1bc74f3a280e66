"""Incremental build: delta merge must be byte-identical to a full
rebuild over the union corpus; reruns are idempotent; cutover is atomic."""

import os

import pyarrow.parquet as pq

import ray.data

from pyf_aggregator_ray.config import EngineConfig
from pyf_aggregator_ray.pipelines.build_index import build_index
from pyf_aggregator_ray.pipelines.incremental import incremental_update
from pyf_aggregator_ray.state import manifest as mf

from test_index_build import load_postings


def test_incremental_equals_full_build(tmp_path, synth_corpus_table, built_index):
    root = str(tmp_path / "inc_root")
    cfg = EngineConfig(hot_df_threshold=20, salt_range_docs=40)

    first = synth_corpus_table.slice(0, 200)
    second = synth_corpus_table.slice(200)
    build_index("", root, cfg, corpus=ray.data.from_arrow(first), num_parts=4)
    v1 = mf.read_alias(root)
    assert mf.read_stats(v1)["num_docs"] == 200

    manifest = incremental_update(root, ray.data.from_arrow(second), cfg)
    assert manifest["kind"] == "incremental"
    # disjoint delta dropped nothing against the watermark -> the
    # reference's window-overflow warning fires (fetcher.py:425-471)
    assert manifest["metrics"]["overlap_docs"] == 0
    assert manifest["window_overflow_warning"] is True
    v2 = mf.read_alias(root)
    assert v2 != v1
    assert mf.read_stats(v2)["num_docs"] == synth_corpus_table.num_rows

    # postings identical (ids, tfs, dls AND stats) to the full build
    full_root, _, _ = built_index
    full = load_postings(full_root)
    inc = load_postings(root)
    assert set(full) == set(inc)
    for term in full:
        assert list(full[term][1]) == list(inc[term][1]), term
        assert list(full[term][2]) == list(inc[term][2]), term
        assert list(full[term][3]) == list(inc[term][3]), term
        assert full[term][0]["df"] == inc[term][0]["df"]
        assert full[term][0]["cf"] == inc[term][0]["cf"]
    assert mf.read_stats(v2)["total_postings"] == mf.read_stats(
        mf.read_alias(full_root)
    )["total_postings"]

    # docs meta complete, sha256 invariant preserved across the merge
    docs = pq.read_table(os.path.join(v2, "docs"))
    assert docs.num_rows == synth_corpus_table.num_rows

    # idempotent rerun: re-sending already-indexed docs changes nothing
    m2 = incremental_update(root, ray.data.from_arrow(second), cfg)
    v3 = mf.read_alias(root)
    assert m2["stats"]["num_docs"] == synth_corpus_table.num_rows
    # full overlap on the rerun -> no overflow warning
    assert m2["metrics"]["overlap_docs"] == second.num_rows
    assert m2["window_overflow_warning"] is False
    assert m2["stats"]["total_postings"] == manifest["stats"]["total_postings"]
    assert mf.read_stats(v3)["vocab_size"] == mf.read_stats(v2)["vocab_size"]

    # old versions remain on disk until GC (zero-downtime property)
    assert os.path.isdir(v1)
    removed = mf.gc_old_versions(root, keep=1)
    assert removed and not os.path.isdir(v1)


def test_incremental_requires_base(tmp_path, synth_corpus_table):
    import pytest

    with pytest.raises(RuntimeError, match="no live index"):
        incremental_update(
            str(tmp_path / "empty_root"),
            ray.data.from_arrow(synth_corpus_table),
        )


def test_incremental_with_interleaved_doc_ids(tmp_path, synth_corpus_table):
    """Delta doc ids INTERLEAVED with indexed ones (even/odd split): shard
    intervals overlap, so the merge must take the decode-merge-reencode
    slow path — and still equal a from-scratch build over the union."""
    import pyarrow.compute as pc

    from test_index_build import naive_inverted_index

    cfg = EngineConfig(hot_df_threshold=20, salt_range_docs=40)
    root = str(tmp_path / "interleave_root")
    even_mask = pc.equal(
        pc.bit_wise_and(synth_corpus_table["doc_id"], 1), 0
    )
    evens = synth_corpus_table.filter(even_mask)
    odds = synth_corpus_table.filter(pc.invert(even_mask))

    build_index("", root, cfg, corpus=ray.data.from_arrow(evens), num_parts=4)
    manifest = incremental_update(root, ray.data.from_arrow(odds), cfg)
    assert manifest["stats"]["num_docs"] == synth_corpus_table.num_rows

    from test_index_build import load_postings

    oracle = naive_inverted_index(synth_corpus_table)
    got = load_postings(root)
    assert set(got) == set(oracle)
    for term, postings in oracle.items():
        _, ids, tfs, dls = got[term]
        assert list(ids) == [p[0] for p in postings], term
        assert list(tfs) == [p[1] for p in postings], term
        assert list(dls) == [p[2] for p in postings], term


def test_parse_feed_entry_reference_vectors():
    """RSS-entry parse goldens (reference tests/test_fetcher.py:467-553
    plus the new-packages feed shape)."""
    import time as _time

    from pyf_aggregator_ray.pipelines.incremental import parse_feed_entry

    r = parse_feed_entry(
        {
            "title": "plone.api 2.0.0",
            "link": "https://pypi.org/project/plone.api/2.0.0/",
            "summary": "A simple API for Plone",
            "published_parsed": _time.strptime("2023-06-15", "%Y-%m-%d"),
        }
    )
    assert r["package_id"] == "plone.api"
    assert r["release_id"] == "2.0.0"
    assert r["timestamp"] is not None
    assert r["description"] == "A simple API for Plone"

    r = parse_feed_entry(
        {
            "title": "plone-app-contenttypes 1.0.0",
            "link": "https://pypi.org/project/plone-app-contenttypes/1.0.0/",
            "summary": "",
            "published_parsed": None,
        }
    )
    assert (r["package_id"], r["release_id"]) == (
        "plone-app-contenttypes",
        "1.0.0",
    )

    assert parse_feed_entry({"title": "", "link": "", "summary": ""}) is None

    r = parse_feed_entry(
        {"title": "", "link": "https://pypi.org/project/some-package/1.0.0/"}
    )
    assert (r["package_id"], r["release_id"]) == ("some-package", "1.0.0")

    r = parse_feed_entry(
        {"title": "some-package", "link": "https://pypi.org/project/some-package/"}
    )
    assert r["package_id"] == "some-package"
    assert r["release_id"] is None

    # new-packages feed: "added to PyPI" title, no release id
    r = parse_feed_entry({"title": "fresh-pkg added to PyPI", "link": ""})
    assert (r["package_id"], r["release_id"]) == ("fresh-pkg", None)

    # name filter drops non-matching entries
    assert (
        parse_feed_entry(
            {"title": "other 1.0", "link": ""}, filter_name="plone"
        )
        is None
    )
    assert (
        parse_feed_entry(
            {"title": "plone.api 1.0", "link": ""}, filter_name="plone"
        )["package_id"]
        == "plone.api"
    )


def test_append_mode_matches_merge_mode(tmp_path, synth_corpus_table, ray_session):
    """mode="append" (O(delta) segment path) must score IDENTICALLY to
    mode="merge": the reader concatenates same-term shard rows, df sums,
    and the version stats agree. Old posting files carry over by
    hardlink — untouched bytes."""
    import os
    import shutil

    import pyarrow as pa
    import ray.data

    from pyf_aggregator_ray.config import EngineConfig
    from pyf_aggregator_ray.pipelines.build_index import build_index
    from pyf_aggregator_ray.pipelines.incremental import incremental_update
    from pyf_aggregator_ray.pipelines.query import IndexReader
    from pyf_aggregator_ray.state import manifest as mf

    cfg = EngineConfig(hot_df_threshold=20, salt_range_docs=40)
    half = synth_corpus_table.slice(0, 200)
    delta = synth_corpus_table.slice(200)

    roots = {}
    for m in ("merge", "append"):
        root = str(tmp_path / m)
        build_index("", root, cfg, corpus=ray.data.from_arrow(half), num_parts=4)
        incremental_update(
            root, ray.data.from_arrow(delta), cfg, num_parts=4, mode=m
        )
        roots[m] = root

    sm = mf.read_stats(mf.read_alias(roots["merge"]))
    sa = mf.read_stats(mf.read_alias(roots["append"]))
    assert sm == sa

    rm = IndexReader(roots["merge"], cfg)
    ra = IndexReader(roots["append"], cfg)
    for query in ("import ident1", "customer value", "the merge sort"):
        assert rm.score(query, 20) == ra.score(query, 20), query

    # append really skipped the rewrite: v1's posting files appear in v2
    v1 = os.path.join(roots["append"], "v1", "postings")
    v2 = os.path.join(roots["append"], "v2", "postings")
    carried = set(os.listdir(v1)) & set(os.listdir(v2))
    assert carried == set(os.listdir(v1))
    assert len(os.listdir(v2)) > len(os.listdir(v1))  # plus delta files


def test_append_compaction_policy_bounds_shards(tmp_path, synth_corpus_table, ray_session):
    """Round-4 compaction policy: repeated mode="append" increments grow
    per-term shard rows; once the live manifest's max_term_shards reaches
    cfg.append_max_term_shards, the NEXT append escalates to a merge-mode
    compaction — postings return to one row per term, byte-identical to a
    full build over the union corpus, and reader shard-concat depth stays
    bounded."""
    import ray.data

    from pyf_aggregator_ray.config import EngineConfig
    from pyf_aggregator_ray.pipelines.build_index import build_index
    from pyf_aggregator_ray.pipelines.incremental import incremental_update
    from pyf_aggregator_ray.pipelines.query import IndexReader

    cfg = EngineConfig(
        hot_df_threshold=20, salt_range_docs=40, append_max_term_shards=3
    )
    root = str(tmp_path / "compact_root")
    base = synth_corpus_table.slice(0, 120)
    deltas = [synth_corpus_table.slice(120 + 70 * i, 70) for i in range(4)]

    build_index("", root, cfg, corpus=ray.data.from_arrow(base), num_parts=4)

    shard_history = []
    manifests = []
    for d in deltas:
        m = incremental_update(
            root, ray.data.from_arrow(d), cfg, num_parts=4, mode="append"
        )
        manifests.append(m)
        shard_history.append(m["max_term_shards"])
        # the policy bound holds after EVERY increment
        assert m["max_term_shards"] <= cfg.append_max_term_shards

    # at least one increment actually appended (shards grew past 1) and
    # at least one escalated to compaction (requested append, ran merge)
    assert any(s > 1 for s in shard_history)
    compactions = [m for m in manifests if m["compacted"]]
    assert compactions, shard_history
    for m in compactions:
        assert m["requested_mode"] == "append" and m["mode"] == "merge"
        assert m["max_term_shards"] == 1

    # drive appends until the live version is freshly compacted, then
    # compare against a from-scratch full build over the same union
    n_used = 120 + 70 * len(deltas)
    if manifests[-1]["max_term_shards"] >= cfg.append_max_term_shards:
        m = incremental_update(
            root,
            ray.data.from_arrow(synth_corpus_table.slice(n_used, 10)),
            cfg,
            num_parts=4,
            mode="append",
        )
        assert m["compacted"] and m["max_term_shards"] == 1
        n_used += 10
    if manifests[-1]["compacted"] or n_used > 120 + 70 * len(deltas):
        full_root = str(tmp_path / "full_root")
        union = synth_corpus_table.slice(0, n_used)
        build_index("", full_root, cfg, corpus=ray.data.from_arrow(union), num_parts=4)
        full = load_postings(full_root)
        inc = load_postings(root)
        assert set(full) == set(inc)
        for term in full:
            for i in (1, 2, 3):
                assert list(full[term][i]) == list(inc[term][i]), term

    # scoring stays correct throughout (reader-level invariant)
    reader = IndexReader(root, cfg)
    assert reader.score("ident1", 10)
