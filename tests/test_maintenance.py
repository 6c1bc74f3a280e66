"""Maintenance paths: tombstone deletes, registry-scoped delete, stale
reconciliation, JSONL export/import, preserved-fields refresh merge."""

import os

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from pyf_aggregator_ray.config import EngineConfig
from pyf_aggregator_ray.pipelines import maintenance as mx
from pyf_aggregator_ray.pipelines.build_index import build_index
from pyf_aggregator_ray.pipelines.query import IndexReader, naive_bm25
from pyf_aggregator_ray.state import manifest as mf

from test_index_build import load_postings, naive_inverted_index


@pytest.fixture()
def small_index(tmp_path, synth_corpus_table):
    root = str(tmp_path / "mx_root")
    cfg = EngineConfig(hot_df_threshold=20, salt_range_docs=40)
    build_index(
        "", root, cfg, corpus=ray.data.from_arrow(synth_corpus_table), num_parts=4
    )
    return root, cfg


def test_delete_docs_tombstone_fold(small_index, synth_corpus_table):
    root, cfg = small_index
    tombs = set(range(0, 300, 7))  # every 7th doc
    manifest = mx.delete_docs(root, tombs, cfg)
    assert manifest["kind"] == "delete"

    survivors = synth_corpus_table.filter(
        pa.compute.invert(
            pa.compute.is_in(
                synth_corpus_table["doc_id"], value_set=pa.array(sorted(tombs))
            )
        )
    )
    oracle = naive_inverted_index(survivors)
    got = load_postings(root)
    assert set(got) == set(oracle)
    for term, postings in oracle.items():
        _, ids, tfs, dls = got[term]
        assert list(ids) == [p[0] for p in postings], term
        assert list(tfs) == [p[1] for p in postings], term
    stats = mf.read_stats(mf.read_alias(root))
    assert stats["num_docs"] == survivors.num_rows
    # avgdl recomputed over survivors — BM25 on the new version must match
    # a naive oracle over the surviving corpus
    reader = IndexReader(root, cfg)
    got_q = reader.score("import ident1", 10)
    exp_q = naive_bm25(survivors, "import ident1", 10, cfg)
    assert [(r, d) for r, d, _ in got_q] == [(r, d) for r, d, _ in exp_q]


def test_delete_by_predicate_registry_scoped(small_index, synth_corpus_table):
    root, cfg = small_index
    manifest = mx.delete_by_predicate(root, "lang", "markdown", cfg)
    langs = dict(
        zip(
            synth_corpus_table["doc_id"].to_pylist(),
            synth_corpus_table["lang"].to_pylist(),
        )
    )
    expected_removed = sum(1 for v in langs.values() if v == "markdown")
    assert manifest["tombstones"] == expected_removed
    import pyarrow.parquet as pq

    docs = pq.read_table(os.path.join(mf.read_alias(root), "docs"), columns=["lang"])
    assert "markdown" not in set(docs["lang"].to_pylist())


def test_registry_isolation_invariants(small_index, synth_corpus_table):
    """Reference registry-isolation suite (tests/test_registry_isolation.
    py:60-359) ported to the lang discriminator: a scoped delete must
    leave every other registry's documents bit-identical, keep the index
    consistent with the survivor set, and be idempotent."""
    import pyarrow.parquet as pq

    root, cfg = small_index
    before = pq.read_table(
        os.path.join(mf.read_alias(root), "docs")
    ).sort_by("doc_id")

    mx.delete_by_predicate(root, "lang", "markdown", cfg)
    after = pq.read_table(
        os.path.join(mf.read_alias(root), "docs")
    ).sort_by("doc_id")

    # 1) other-registry docs untouched, byte for byte (ids, sha256, dl)
    keep_mask = pa.compute.invert(
        pa.compute.equal(before["lang"], "markdown")
    )
    survivors = before.filter(keep_mask)
    assert after.equals(survivors)

    # 2) postings reflect exactly the survivor set: equal to a naive
    # index over surviving rows
    surviving_rows = synth_corpus_table.filter(
        pa.compute.invert(pa.compute.equal(synth_corpus_table["lang"], "markdown"))
    )
    oracle = naive_inverted_index(surviving_rows)
    got = load_postings(root)
    assert set(got) == set(oracle)
    for term, postings in oracle.items():
        _, ids, tfs, _ = got[term]
        assert list(ids) == [p[0] for p in postings], term
        assert list(tfs) == [p[1] for p in postings], term

    # 3) idempotence: repeating the scoped delete tombstones nothing
    m2 = mx.delete_by_predicate(root, "lang", "markdown", cfg)
    assert m2["tombstones"] == 0
    again = pq.read_table(
        os.path.join(mf.read_alias(root), "docs")
    ).sort_by("doc_id")
    assert again.equals(after)


def test_reconcile_stale(small_index, synth_corpus_table):
    root, cfg = small_index
    fresh = set(range(0, 250))  # docs 250+ vanished upstream
    manifest = mx.reconcile_stale(root, fresh, cfg)
    assert manifest["stats"]["num_docs"] == 250


def test_migrate_index(small_index, tmp_path):
    """K5 migrate: live version copied into another root as its next
    version, counts verified, destination alias switched, source
    untouched; queries answer identically from the migrated copy."""
    root, cfg = small_index
    dst = str(tmp_path / "migrated_root")
    manifest = mx.migrate_index(root, dst)
    assert manifest["kind"] == "migrate"
    src_live = mf.read_alias(root)
    dst_live = mf.read_alias(dst)
    assert dst_live and dst_live != src_live
    assert mf.read_stats(dst_live) == mf.read_stats(src_live)
    src_post = load_postings(root)
    dst_post = load_postings(dst)
    assert set(src_post) == set(dst_post)
    r1 = IndexReader(root).score("merge sort", 5)
    r2 = IndexReader(dst).score("merge sort", 5)
    assert r1 == r2


def test_export_import_round_trip(small_index, tmp_path):
    root, _ = small_index
    out = str(tmp_path / "export")
    n = mx.export_docs_jsonl(root, out)
    back = mx.import_docs_jsonl(out)
    assert back.count() == n
    cols = set(back.schema().names)
    assert {"doc_id", "repo", "sha256", "dl"} <= cols


def test_refresh_merge_preserves_enrichment():
    old = ray.data.from_items(
        [
            {"name": "a", "version": "1.0", "github_stars": 80, "github_url": "u/a"},
            {"name": "b", "version": "1.0", "github_stars": 60, "github_url": "u/b"},
            # old value falsy -> never preserved (reference main.py:125)
            {"name": "d", "version": "1.0", "github_stars": 0, "github_url": ""},
            {"name": "gone", "version": "1.0", "github_stars": 10, "github_url": "u/g"},
        ]
    )
    new = ray.data.from_items(
        [
            # refetched without enrichment -> coalesce from old
            {"name": "a", "version": "2.0", "github_stars": 0, "github_url": ""},
            # refetched WITH fresh enrichment -> keep new
            {"name": "b", "version": "2.0", "github_stars": 75, "github_url": "u/b2"},
            # brand new package, nothing to preserve
            {"name": "c", "version": "0.1", "github_stars": 0, "github_url": ""},
            {"name": "d", "version": "2.0", "github_stars": 0, "github_url": ""},
        ]
    )
    merged = (
        mx.refresh_merge(old, new)
        .to_pandas()
        .set_index("name")
        .sort_index()
    )
    assert list(merged.index) == ["a", "b", "c", "d"]  # 'gone' dropped (D3)
    assert merged.loc["a", "version"] == "2.0"
    assert merged.loc["a", "github_stars"] == 80  # preserved
    assert merged.loc["a", "github_url"] == "u/a"  # preserved
    assert merged.loc["b", "github_stars"] == 75  # fresh wins
    assert merged.loc["b", "github_url"] == "u/b2"
    assert merged.loc["c", "github_stars"] == 0
    assert merged.loc["d", "github_stars"] == 0  # falsy old never clobbers


def test_refresh_ids_identical_to_full_fetch():
    """Reference invariant (test_registry_isolation.py:359): a refresh
    writes exactly the ids a full fetch would — old-only packages drop,
    new packages appear, versions come from the fresh fetch."""
    old = ray.data.from_items(
        [{"name": f"p{i}", "version": "1.0", "github_stars": i} for i in range(30)]
    )
    # fresh fetch: p10..p39 (p0..p9 vanished upstream, p30..p39 are new)
    new_rows = [
        {"name": f"p{i}", "version": "2.0", "github_stars": 0}
        for i in range(10, 40)
    ]
    merged = mx.refresh_merge(old, ray.data.from_items(new_rows)).to_pandas()
    assert sorted(merged["name"]) == sorted(r["name"] for r in new_rows)
    assert (merged["version"] == "2.0").all()


def test_refresh_merge_keeps_recomputed_zero_scores():
    """A field the chain RECOMPUTES (health_score) is not in
    PRESERVED_FIELDS: a genuinely recomputed 0 must survive the refresh
    instead of being overwritten by the stale old value."""
    assert "health_score" not in mx.PRESERVED_FIELDS
    old = ray.data.from_items(
        [{"name": "a", "version": "1.0", "health_score": 80}]
    )
    new = ray.data.from_items(
        [{"name": "a", "version": "2.0", "health_score": 0}]
    )
    merged = mx.refresh_merge(old, new).to_pandas()
    assert merged.loc[0, "health_score"] == 0


def test_recreate_index_default_deletes_old(small_index):
    """Reference recreate_collection semantics (typesense_util.py:174-270):
    new version carries identical docs + query behavior, alias switches,
    and the old version dir is deleted by default."""
    root, cfg = small_index
    old_live = mf.read_alias(root)
    reader_before = IndexReader(root, cfg)
    before = reader_before.score("import ident1", 10)

    result = mx.recreate_index(root)
    assert result["deleted_old"] is True
    assert not os.path.exists(old_live)
    new_live = mf.read_alias(root)
    assert new_live == result["new_version"] and new_live != old_live
    assert (mf.read_manifest(new_live) or {}).get("kind") == "recreate"
    # identical content and scoring through the new version
    assert IndexReader(root, cfg).score("import ident1", 10) == before
    assert mf.read_stats(new_live)["num_docs"] == result["num_docs"]


def test_recreate_index_keep_old(small_index):
    root, cfg = small_index
    old_live = mf.read_alias(root)
    result = mx.recreate_index(root, delete_old=False)
    assert result["deleted_old"] is False
    assert os.path.exists(old_live)  # kept for manual deletion
    assert mf.read_alias(root) != old_live


def test_recreate_index_empty_source_succeeds(small_index, synth_corpus_table):
    """An EMPTY live index recreates to another empty version without
    raising (reference tests/test_typesense_util.py:467-494)."""
    root, cfg = small_index
    all_ids = set(synth_corpus_table["doc_id"].to_pylist())
    mx.delete_docs(root, all_ids, cfg)
    assert mf.read_stats(mf.read_alias(root))["num_docs"] == 0
    result = mx.recreate_index(root)
    assert result["num_docs"] == 0
    assert mf.read_alias(root) == result["new_version"]


def test_recreate_index_no_live_raises(tmp_path):
    with pytest.raises(RuntimeError):
        mx.recreate_index(str(tmp_path / "nonexistent_root"))


def test_refresh_merge_preserves_contributors_list(ray_session):
    """The reference's GITHUB_FIELDS includes the nested contributors
    list (main.py:17-25): a refresh whose fresh doc has an empty list
    coalesces the old one; a non-empty fresh list wins."""
    import pandas as pd

    old = ray.data.from_items(
        [
            {"name": "a", "github_stars": 10,
             "contributors": [{"login": "x", "commits": 5}]},
            {"name": "b", "github_stars": 3,
             "contributors": [{"login": "y", "commits": 2}]},
        ]
    )
    new = ray.data.from_items(
        [
            {"name": "a", "github_stars": 0, "contributors": []},
            {"name": "b", "github_stars": 7,
             "contributors": [{"login": "z", "commits": 9}]},
        ]
    )
    out = (
        mx.refresh_merge(old, new)
        .to_pandas()
        .set_index("name")
        .sort_index()
    )
    a = list(out.loc["a", "contributors"])
    b = list(out.loc["b", "contributors"])
    assert [c["login"] for c in a] == ["x"]  # empty fresh -> old preserved
    assert [c["login"] for c in b] == ["z"]  # fresh wins
    assert out.loc["a", "github_stars"] == 10  # scalar coalesce unchanged
    assert out.loc["b", "github_stars"] == 7
