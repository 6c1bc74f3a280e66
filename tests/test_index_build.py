"""Index build correctness: posting-list equality vs a naive in-memory
oracle, sha256 per-row invariant, salting/merge, resumable rebuild."""

import json
import os
import re
from collections import Counter, defaultdict

import numpy as np
import pyarrow.parquet as pq
import pytest

import ray.data

from pyf_aggregator_ray.stages.postings import decode_posting_row
from pyf_aggregator_ray.state import manifest as mf


def naive_inverted_index(corpus_table):
    """Pure-Python oracle: term -> sorted [(doc_id, tf, dl)]."""
    token_re = re.compile("[a-z0-9]+")
    index = defaultdict(list)
    for doc_id, content in zip(
        corpus_table["doc_id"].to_pylist(), corpus_table["content"].to_pylist()
    ):
        toks = token_re.findall((content or "").lower())
        dl = len(toks)
        for term, tf in sorted(Counter(toks).items()):
            index[term].append((doc_id, tf, dl))
    return {t: sorted(v) for t, v in index.items()}


def load_postings(root):
    vdir = mf.read_alias(root)
    tbl = pq.read_table(os.path.join(vdir, "postings"))
    out = {}
    for i in range(tbl.num_rows):
        row = {c: tbl[c][i].as_py() for c in tbl.column_names}
        ids, tfs, dls = decode_posting_row(row)
        out[row["term"]] = (row, ids, tfs, dls)
    return out


def test_postings_match_naive_oracle(built_index, synth_corpus_table):
    root, cfg, manifest = built_index
    oracle = naive_inverted_index(synth_corpus_table)
    got = load_postings(root)
    assert set(got) == set(oracle)
    for term, postings in oracle.items():
        row, ids, tfs, dls = got[term]
        exp_ids = [p[0] for p in postings]
        assert list(ids) == exp_ids, term
        assert list(tfs) == [p[1] for p in postings], term
        assert list(dls) == [p[2] for p in postings], term
        assert row["df"] == len(postings)
        assert row["cf"] == sum(p[1] for p in postings)
        # doc ids strictly increasing (delta-gap correctness)
        assert np.all(np.diff(ids) > 0) or len(ids) <= 1


def test_salting_was_exercised(built_index, synth_corpus_table):
    """With hot_df_threshold=20 and salt_range_docs=40, hot terms must have
    been split into multiple shards and merged back losslessly."""
    root, cfg, manifest = built_index
    oracle = naive_inverted_index(synth_corpus_table)
    hot = [t for t, p in oracle.items() if len(p) > 80]
    assert hot, "synthetic corpus should contain hot terms"
    assert manifest["metrics"]["num_hot_terms"] > 0
    got = load_postings(root)
    for t in hot:
        _, ids, _, _ = got[t]
        assert list(ids) == [p[0] for p in oracle[t]]


def test_sha256_invariant(built_index, synth_corpus_table):
    """north rule: per-row content sha256 equality vs the source table."""
    import hashlib

    root, _, _ = built_index
    vdir = mf.read_alias(root)
    docs = pq.read_table(os.path.join(vdir, "docs")).sort_by("doc_id")
    src = synth_corpus_table.sort_by("doc_id")
    assert docs.num_rows == src.num_rows
    for got, content in zip(
        docs["sha256"].to_pylist(), src["content"].to_pylist()
    ):
        assert got == hashlib.sha256((content or "").encode()).hexdigest()


def test_stats(built_index, synth_corpus_table):
    root, _, _ = built_index
    vdir = mf.read_alias(root)
    stats = mf.read_stats(vdir)
    oracle = naive_inverted_index(synth_corpus_table)
    assert stats["num_docs"] == synth_corpus_table.num_rows
    assert stats["vocab_size"] == len(oracle)
    assert stats["total_postings"] == sum(len(v) for v in oracle.values())
    total_tokens = sum(tf for v in oracle.values() for _, tf, _ in v)
    assert stats["total_tokens"] == total_tokens
    dls = {p[0]: p[2] for v in oracle.values() for p in v}
    exp_avgdl = sum(dls.values()) / synth_corpus_table.num_rows
    assert stats["avgdl"] == pytest.approx(exp_avgdl)


def test_resumable_build_identical_postings(
    tmp_path, synth_corpus_table, built_index
):
    """Partitioned checkpointed build must produce byte-identical posting
    lists, and a rerun must skip completed partitions."""
    from pyf_aggregator_ray.config import EngineConfig
    from pyf_aggregator_ray.pipelines.build_index import build_index

    root = str(tmp_path / "resumable_root")
    cfg = EngineConfig(hot_df_threshold=20, salt_range_docs=40)
    corpus = ray.data.from_arrow(synth_corpus_table)
    build_index("", root, cfg, corpus=corpus, resumable=True, num_partitions=4)

    fast_root, _, _ = built_index
    fast = load_postings(fast_root)
    resumed = load_postings(root)
    assert set(fast) == set(resumed)
    for term in fast:
        assert list(fast[term][1]) == list(resumed[term][1]), term
        assert list(fast[term][2]) == list(resumed[term][2]), term

    # all partitions marked done; a second build of the same version dir
    # skips them (checkpoint resume)
    vdir = mf.read_alias(root)
    for pid in range(4):
        assert mf.partition_done(vdir, pid)
    marker = os.path.join(vdir, "partials", "part_00002", "_SUCCESS")
    before = os.path.getmtime(marker)
    from pyf_aggregator_ray.pipelines.build_index import _build_partials

    _build_partials("", vdir, cfg, corpus, 4)  # no-op: everything done
    assert os.path.getmtime(marker) == before


def test_resumable_build_resumes_through_public_entry(
    tmp_path, synth_corpus_table, built_index
):
    """A crashed `build --resumable` run leaves v{N}/partials with some
    _SUCCESS markers and no manifest; a rerun through build_index() must
    REUSE that version dir (not allocate v{N+1}), skip the completed
    partitions, and finish to a correct index."""
    import shutil

    from pyf_aggregator_ray.config import EngineConfig
    from pyf_aggregator_ray.pipelines.build_index import (
        _build_partials,
        build_index,
    )

    root = str(tmp_path / "crash_root")
    cfg = EngineConfig(hot_df_threshold=20, salt_range_docs=40)
    corpus = ray.data.from_arrow(synth_corpus_table)

    # simulate the crashed first attempt: checkpoints for partitions
    # 0-2 exist, partition 3 is incomplete, no manifest was written
    vdir = os.path.join(root, "v1")
    os.makedirs(vdir, exist_ok=True)
    _build_partials("", vdir, cfg, corpus, 4)
    shutil.rmtree(os.path.join(vdir, "partials", "part_00003"))
    assert mf.read_manifest(vdir) is None

    kept = os.path.getmtime(
        os.path.join(vdir, "partials", "part_00001", "_SUCCESS")
    )
    manifest = build_index(
        "", root, cfg, corpus=corpus, resumable=True, num_partitions=4
    )
    # same version reused, completed partitions untouched
    assert manifest["version"] == 1
    assert mf.read_alias(root) == vdir
    assert os.path.getmtime(
        os.path.join(vdir, "partials", "part_00001", "_SUCCESS")
    ) == kept

    # and the resumed index equals the from-scratch one
    fast_root, _, _ = built_index
    fast = load_postings(fast_root)
    resumed = load_postings(root)
    assert set(fast) == set(resumed)
    for term in fast:
        assert list(fast[term][1]) == list(resumed[term][1]), term


def test_resumable_rerun_rejects_mismatched_partition_config(
    tmp_path, synth_corpus_table
):
    """Stale checkpoints from a DIFFERENT partitioning/salting layout must
    NOT be reused — a rerun with changed num_partitions allocates a fresh
    version instead of merging incompatible partials."""
    from pyf_aggregator_ray.config import EngineConfig
    from pyf_aggregator_ray.pipelines.build_index import (
        _build_partials,
        build_index,
    )

    root = str(tmp_path / "mismatch_root")
    cfg = EngineConfig(hot_df_threshold=20, salt_range_docs=40)
    corpus = ray.data.from_arrow(synth_corpus_table)

    # crashed attempt with num_partitions=4 (no manifest)
    vdir = os.path.join(root, "v1")
    os.makedirs(vdir, exist_ok=True)
    _build_partials("", vdir, cfg, corpus, 4)

    # rerun with num_partitions=8: incompatible -> fresh version v2
    manifest = build_index(
        "", root, cfg, corpus=corpus, resumable=True, num_partitions=8
    )
    assert manifest["version"] == 2
    assert mf.read_alias(root) == os.path.join(root, "v2")


def test_term_shuffle_strategy_identical(tmp_path, synth_corpus_table, built_index):
    """The explicit groupby(term) shuffle path and the default segment
    path must produce identical posting lists."""
    from pyf_aggregator_ray.config import EngineConfig
    from pyf_aggregator_ray.pipelines.build_index import build_index

    root = str(tmp_path / "shuffle_root")
    cfg = EngineConfig(hot_df_threshold=20, salt_range_docs=40)
    corpus = ray.data.from_arrow(synth_corpus_table)
    m = build_index(
        "", root, cfg, corpus=corpus, num_parts=4, strategy="term_shuffle"
    )
    assert m["metrics"]["num_hot_terms"] > 0  # hot set actually detected
    seg = load_postings(built_index[0])
    shuf = load_postings(root)
    assert set(seg) == set(shuf)
    for term in seg:
        assert list(seg[term][1]) == list(shuf[term][1]), term
        assert list(seg[term][2]) == list(shuf[term][2]), term
        assert list(seg[term][3]) == list(shuf[term][3]), term


def test_merge_interleaved_shards():
    """Strided doc-id layouts make shard intervals interleave — the merge
    must fall back to decode-merge-reencode and stay exact."""
    import pyarrow as pa

    from pyf_aggregator_ray.functions.varint import encode_varint, delta_encode
    from pyf_aggregator_ray.stages.postings import decode_posting_row, merge_partition

    def shard(ids, tfs, dls):
        ids = np.array(ids, dtype=np.uint64)
        return {
            "df": len(ids),
            "cf": int(sum(tfs)),
            "first_doc": int(ids[0]),
            "last_doc": int(ids[-1]),
            "gaps": encode_varint(delta_encode(ids)),
            "tfs": encode_varint(np.array(tfs, dtype=np.uint64)),
            "dls": encode_varint(np.array(dls, dtype=np.uint64)),
        }

    s1 = shard([1, 5, 100], [1, 2, 3], [10, 10, 10])
    s2 = shard([3, 7, 50], [4, 5, 6], [20, 20, 20])  # interleaves with s1
    tbl = pa.table(
        {
            "term": ["x", "x"],
            "salt": [0, 1],
            "df": [s1["df"], s2["df"]],
            "cf": [s1["cf"], s2["cf"]],
            "first_doc": [s1["first_doc"], s2["first_doc"]],
            "last_doc": [s1["last_doc"], s2["last_doc"]],
            "gaps": pa.array([s1["gaps"], s2["gaps"]], type=pa.large_binary()),
            "tfs": pa.array([s1["tfs"], s2["tfs"]], type=pa.large_binary()),
            "dls": pa.array([s1["dls"], s2["dls"]], type=pa.large_binary()),
        }
    )
    out = merge_partition(tbl)
    assert out.num_rows == 1
    row = {c: out[c][0].as_py() for c in out.column_names}
    ids, tfs, dls = decode_posting_row(row)
    assert list(ids) == [1, 3, 5, 7, 50, 100]
    assert list(tfs) == [1, 4, 2, 5, 6, 3]
    assert list(dls) == [10, 20, 10, 20, 20, 10]
    assert row["df"] == 6 and row["cf"] == 21

    # duplicate doc ids across shards = build bug -> raises
    s3 = shard([1, 9], [7, 8], [5, 5])
    bad = pa.table(
        {
            "term": ["x", "x"],
            "salt": [0, 1],
            "df": [s1["df"], s3["df"]],
            "cf": [s1["cf"], s3["cf"]],
            "first_doc": [s1["first_doc"], s3["first_doc"]],
            "last_doc": [s1["last_doc"], s3["last_doc"]],
            "gaps": pa.array([s1["gaps"], s3["gaps"]], type=pa.large_binary()),
            "tfs": pa.array([s1["tfs"], s3["tfs"]], type=pa.large_binary()),
            "dls": pa.array([s1["dls"], s3["dls"]], type=pa.large_binary()),
        }
    )
    with pytest.raises(ValueError, match="duplicate doc ids"):
        merge_partition(bad)


def test_manifest_lineage(built_index):
    root, _, manifest = built_index
    vdir = mf.read_alias(root)
    on_disk = mf.read_manifest(vdir)
    assert on_disk["version"] == manifest["version"]
    assert on_disk["stats"]["num_docs"] == manifest["stats"]["num_docs"]
    assert "docs_per_sec" in on_disk["metrics"]
    assert "postings_per_sec" in on_disk["metrics"]
    assert on_disk["config"]["k1"] == 1.2


def test_empty_corpus_builds_valid_empty_index(tmp_path, ray_session):
    """An empty corpus must build an empty-but-valid versioned index
    (readable artifacts, zero stats, queryable with no results)."""
    import pyarrow as pa
    import ray.data

    from pyf_aggregator_ray.config import EngineConfig
    from pyf_aggregator_ray.pipelines.build_index import build_index
    from pyf_aggregator_ray.pipelines.query import IndexReader

    empty = pa.table(
        {"doc_id": pa.array([], type=pa.int64()),
         "repo": pa.array([], type=pa.string()),
         "path": pa.array([], type=pa.string()),
         "commit": pa.array([], type=pa.string()),
         "lang": pa.array([], type=pa.string()),
         "content": pa.array([], type=pa.string())}
    )
    root = str(tmp_path / "empty_root")
    manifest = build_index(
        "", root, EngineConfig(), corpus=ray.data.from_arrow(empty), num_parts=2
    )
    assert manifest["stats"]["num_docs"] == 0
    assert manifest["stats"]["vocab_size"] == 0
    reader = IndexReader(root)
    assert reader.score("anything at all", 10) == []
