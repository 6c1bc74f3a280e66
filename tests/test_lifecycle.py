"""End-to-end index lifecycle: build -> incremental -> scoped delete ->
migrate -> gc — the reference's collection lifecycle (create, import,
refresh, registry-scoped maintenance, migrate, cleanup) chained on one
root, with a valid queryable ALIAS at every step (zero-downtime)."""

import os

import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

import ray.data

from pyf_aggregator_ray.config import EngineConfig
from pyf_aggregator_ray.pipelines import maintenance as mx
from pyf_aggregator_ray.pipelines.build_index import build_index
from pyf_aggregator_ray.pipelines.incremental import incremental_update
from pyf_aggregator_ray.pipelines.query import IndexReader
from pyf_aggregator_ray.state import manifest as mf

from test_index_build import load_postings, naive_inverted_index


def test_full_lifecycle(tmp_path, synth_corpus_table, ray_session):
    cfg = EngineConfig(hot_df_threshold=20, salt_range_docs=40)
    root = str(tmp_path / "life_root")

    # 1) full build over the first 200 docs
    a = synth_corpus_table.slice(0, 200)
    b = synth_corpus_table.slice(200)
    build_index("", root, cfg, corpus=ray.data.from_arrow(a), num_parts=4)
    assert mf.read_stats(mf.read_alias(root))["num_docs"] == 200
    assert IndexReader(root).score("import def", 5)  # queryable immediately

    # 2) incremental merge of the remainder
    incremental_update(root, ray.data.from_arrow(b), cfg)
    assert mf.read_stats(mf.read_alias(root))["num_docs"] == synth_corpus_table.num_rows

    # 3) registry-scoped delete (lang discriminator)
    mx.delete_by_predicate(root, "lang", "markdown", cfg)
    live = mf.read_alias(root)
    langs = set(
        pq.read_table(os.path.join(live, "docs"), columns=["lang"])["lang"].to_pylist()
    )
    assert "markdown" not in langs

    # index consistent with the survivor set after the whole chain
    survivors = synth_corpus_table.filter(
        pc.invert(pc.equal(synth_corpus_table["lang"], "markdown"))
    )
    oracle = naive_inverted_index(survivors)
    got = load_postings(root)
    assert set(got) == set(oracle)
    for term in oracle:
        assert list(got[term][1]) == [p[0] for p in oracle[term]], term

    # 4) migrate to a second root; identical answers
    dst = str(tmp_path / "life_migrated")
    mx.migrate_index(root, dst)
    assert IndexReader(dst).score("import def", 5) == IndexReader(root).score("import def", 5)

    # 5) gc: only the live version survives; still queryable
    versions_before = mf.list_versions(root)
    assert len(versions_before) >= 3
    removed = mf.gc_old_versions(root, keep=1)
    assert removed
    assert mf.read_alias(root) == live
    assert IndexReader(root).score("import def", 5)
