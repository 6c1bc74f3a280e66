"""BM25 top-k rank identity vs the exhaustive naive oracle (north rule)."""

import numpy as np
import pytest

from pyf_aggregator_ray.pipelines.query import (
    IndexReader,
    QUERY_SET,
    naive_bm25,
    run_query_set,
)

TEST_QUERIES = [
    ("import", 10),  # hot (salted) term
    ("import def self", 20),
    ("ident3", 10),
    ("rare50_1", 5),  # unique rare term
    ("ident1 ident2 rare77_0", 10),
    ("zzz_not_present", 10),
    ("import", 1),
    ("def return", 10_000),  # k beyond matches
    ("Ident4.IDENT5-ident6", 10),  # separator + case semantics
]


def test_rank_identity_vs_naive(built_index, synth_corpus_table):
    root, cfg, _ = built_index
    reader = IndexReader(root, cfg)
    for query, k in TEST_QUERIES:
        got = reader.score(query, k)
        exp = naive_bm25(synth_corpus_table, query, k, cfg)
        assert [(r, d) for r, d, _ in got] == [(r, d) for r, d, _ in exp], query
        for (_, _, s1), (_, _, s2) in zip(got, exp):
            assert s1 == pytest.approx(s2, abs=1e-9), query


def test_maxscore_identical_to_exhaustive(built_index):
    """MaxScore pruning must be rank- AND score-identical to the
    exhaustive scorer (exactness of the upper-bound pruning)."""
    root, cfg, _ = built_index
    reader = IndexReader(root, cfg)
    for query, k in TEST_QUERIES:
        exhaustive = reader.score(query, k)
        pruned = reader.score_maxscore(query, k)
        assert pruned == exhaustive, query
    # k=1 aggressive pruning and k bigger than corpus
    assert reader.score_maxscore("import", 1) == reader.score("import", 1)
    assert reader.score_maxscore("rare50_1 import", 10_000) == reader.score(
        "rare50_1 import", 10_000
    )


def test_deterministic_tiebreak(built_index, synth_corpus_table):
    """Docs with identical score must rank by doc_id ascending."""
    root, cfg, _ = built_index
    reader = IndexReader(root, cfg)
    res = reader.score("import def self return", 300)
    scores = {}
    for rank, doc, s in res:
        scores.setdefault(round(s, 12), []).append(doc)
    for docs in scores.values():
        assert docs == sorted(docs)


def test_empty_query_and_absent_terms(built_index):
    root, cfg, _ = built_index
    reader = IndexReader(root, cfg)
    assert reader.score("", 10) == []
    assert reader.score("...///@@@", 10) == []
    assert reader.score("absentterm9999", 10) == []


def test_ray_pipeline_matches_direct(built_index):
    """The actor-pool query pipeline returns the same rows as direct
    scoring (plus score rounding)."""
    root, cfg, _ = built_index
    queries = [(i, q, k) for i, (q, k) in enumerate(TEST_QUERIES[:5])]
    ds = run_query_set(root, queries, cfg)
    got = ds.to_pandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    reader = IndexReader(root, cfg)
    rows = []
    for qid, q, k in queries:
        for rank, doc, s in reader.score(q, k):
            rows.append((qid, rank, doc, round(s, 6)))
    assert list(map(tuple, got.itertuples(index=False))) == [
        (a, b, c, pytest.approx(d)) for a, b, c, d in rows
    ]


def test_weighted_scoring(built_index, synth_corpus_table):
    root, cfg, _ = built_index
    reader = IndexReader(root, cfg)
    ids = synth_corpus_table["doc_id"].to_pylist()
    weights = {d: 1.0 + (d % 3) for d in ids}
    got = reader.score("import ident1", 50, doc_weights=weights)
    exp = naive_bm25(synth_corpus_table, "import ident1", 50, cfg, doc_weights=weights)
    assert [(r, d) for r, d, _ in got] == [(r, d) for r, d, _ in exp]


def test_levenshtein_matches_duckdb():
    """The engine-side edit distance must agree with DuckDB's
    levenshtein() (the oracle's expansion predicate) on realistic pairs."""
    import duckdb

    from pyf_aggregator_ray.pipelines.registry import _levenshtein

    con = duckdb.connect()
    vocab = ["merge", "sort", "spark", "scan", "window", "table", "the",
             "a", "value", "stream", "batch", ""]
    probes = ["mergw", "sparc", "windoww", "tble", "qqqqqq", "a", "", "me"]
    for p in probes:
        for v in vocab:
            sql = con.execute(
                "SELECT levenshtein(?, ?)", [p, v]
            ).fetchone()[0]
            assert _levenshtein(p, v) == sql, (p, v)


def test_index_reader_missing_root_raises(tmp_path):
    from pyf_aggregator_ray.pipelines.query import IndexReader

    with pytest.raises((RuntimeError, FileNotFoundError, TypeError)):
        IndexReader(str(tmp_path / "no_such_index"))


def test_reader_concatenates_sharded_terms(tmp_path, ray_session):
    """A term spanning multiple posting rows (disjoint doc-id shards, the
    shape a hot-row size cap would emit) must score identically to the
    single-row encoding — the reader concatenates, never overwrites."""
    import os

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pyf_aggregator_ray.functions.varint import encode_posting_list
    from pyf_aggregator_ray.pipelines.query import IndexReader
    from pyf_aggregator_ray.state import manifest as mf

    def posting_row(term, ids, tfs, dls):
        g, t, d = encode_posting_list(
            np.array(ids), np.array(tfs), np.array(dls)
        )
        return {
            "term": term, "df": len(ids), "cf": int(sum(tfs)),
            "first_doc": min(ids), "last_doc": max(ids),
            "gaps": g, "tfs": t, "dls": d,
        }

    def build(root, rows, num_docs, total_tokens):
        vdir = mf.version_dir(root, 1)
        os.makedirs(os.path.join(vdir, "postings"), exist_ok=True)
        pq.write_table(
            pa.Table.from_pylist(rows),
            os.path.join(vdir, "postings", "p.parquet"),
        )
        mf.write_stats(vdir, {
            "num_docs": num_docs, "avgdl": total_tokens / num_docs,
            "vocab_size": 1, "total_postings": num_docs,
            "total_tokens": total_tokens, "k1": 1.2, "b": 0.75,
        })
        mf.write_manifest(vdir, {"version": 1})
        mf.switch_alias(root, 1)

    ids = list(range(10)); tfs = [i + 1 for i in range(10)]; dls = [20] * 10
    single = str(tmp_path / "single")
    build(single, [posting_row("zzterm", ids, tfs, dls)], 10, 200)
    sharded = str(tmp_path / "sharded")
    build(
        sharded,
        [posting_row("zzterm", ids[:4], tfs[:4], dls[:4]),
         posting_row("zzterm", ids[4:], tfs[4:], dls[4:])],
        10, 200,
    )
    got_single = IndexReader(single).score("zzterm", 10)
    got_sharded = IndexReader(sharded).score("zzterm", 10)
    assert got_single == got_sharded
    assert len(got_single) == 10
