"""Contract-in-pytest for the search/feature queries that have no
dedicated unit suite: each runs at sf0.001 and must match its DuckDB
oracle row-for-row (the same comparison the driver applies at sf0.01)."""

import duckdb
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"

FEATURES = [
    "bm25_facets",
    "bm25_snippets",
    "search_sorted_by_field",
    "prefix_search",
    "typo_search",  # merged: one entry carries both budgets (d=1, d=2)
    "weighted_field_search",
    "incremental_term_stats",
    "delete_lang_term_stats",
    "refresh_merge_docs",
    "top_contributors",
    "npm_version_expansion",
    "embedding_near_dup",
    "media_features",  # merged: image + audio modalities
    "text_stats",  # merged: langid/token_count/quality/fingerprint
    "near_dup_pairs",  # merged: minhash_lsh + exact ngram jaccard
    "corpus_docs",  # merged: corpus derivation + sha256 invariant
    "corpus_curation",
    "filtered_search",
    "grouped_search",
    "phrase_search",
    "hybrid_search",  # merged: brute + lsh vector backends
    "negation_search",
    "infix_search",
]


@pytest.fixture(scope="module")
def contract(ray_session):
    from pyf_aggregator_ray.pipelines import registry

    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return registry.queries(), registry.oracle_sql(), con


@pytest.mark.parametrize("name", FEATURES)
def test_feature_matches_oracle(contract, name):
    queries, oracles, con = contract
    res = queries[name](SF)
    res = res.to_pandas() if hasattr(res, "to_pandas") else res
    oracle = con.execute(oracles[name]).fetchdf()
    cols = sorted(res.columns)
    assert cols == sorted(oracle.columns), name
    assert len(res) == len(oracle), name
    r1 = res[cols].sort_values(cols).reset_index(drop=True)
    r2 = oracle[cols].sort_values(cols).reset_index(drop=True)
    for c in cols:
        if pd.api.types.is_float_dtype(r1[c]) or pd.api.types.is_float_dtype(r2[c]):
            assert (
                (r1[c].astype(float) - r2[c].astype(float)).abs() < 1e-12
            ).all(), (name, c)
        else:
            assert (r1[c].astype(str) == r2[c].astype(str)).all(), (name, c)


def test_symspell_expansion_complete(ray_session):
    """SymSpell property on the real dictionary: artifact-based expansion
    finds EXACTLY the terms a brute-force Levenshtein scan finds, at both
    distance budgets (lev<=d implies shared <=d-deletion key, and the
    verification step prunes the rest)."""
    from pyf_aggregator_ray.pipelines.registry import (
        _levenshtein,
        _typo_expand,
        ensure_index,
    )
    from pyf_aggregator_ray.state import manifest as mf
    import duckdb
    import os

    root = ensure_index(SF)
    vdir = mf.read_alias(root)
    vocab = [
        r[0]
        for r in duckdb.connect()
        .execute(
            "SELECT DISTINCT unnest(regexp_extract_all(lower(text), '[a-z0-9]+'))"
            f" FROM read_parquet('{SF}/documents.parquet')"
        )
        .fetchall()
    ]
    tokens = ["mergw", "sparc", "custoomer", "tble", "qqqq", "windoww"]
    for d in (1, 2):
        got = _typo_expand(vdir, {0: tokens}, d)[0]
        want = {
            t for t in vocab if any(_levenshtein(tok, t) <= d for tok in tokens)
        }
        assert got == want, (d, got ^ want)


def test_infix_artifact_expansion_complete(ray_session):
    """Char-n-gram artifact property on the real dictionary: artifact
    expansion finds EXACTLY the terms the (pre-artifact) distributed
    substring scan finds — short fragments (<= n: gram equality IS
    containment), long fragments (> n: gram intersection + verify),
    absent fragments, and single-letter fragments."""
    from pyf_aggregator_ray.pipelines.registry import (
        _infix_expand,
        _infix_scan,
        ensure_index,
    )
    from pyf_aggregator_ray.state import manifest as mf

    root = ensure_index(SF)
    vdir = mf.read_alias(root)
    frags = [
        (0, "erge"), (1, "usto"), (2, "zzzqx"), (3, "ind"),
        (4, "q"), (5, "er"), (6, "ustomer"), (7, "merge"),
    ]
    assert _infix_expand(vdir, frags) == _infix_scan(vdir, frags)


def test_infix_query_path_reads_artifact_only(ray_session, tmp_path):
    """The infix query path must never scan the term dictionary: build
    the artifact from a tiny private index copy, DELETE the postings
    (the dictionary), and expansion still answers correctly from the
    artifact alone — the corpus-deleted pattern fieldsearch uses."""
    import os
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq

    from pyf_aggregator_ray.pipelines.registry import (
        _infix_expand,
        ensure_infix_artifact,
    )

    vdir = str(tmp_path / "v1")
    os.makedirs(os.path.join(vdir, "postings"))
    vocab = ["merge", "merged", "emerge", "sort", "customer", "custom", "in"]
    pq.write_table(
        pa.table({"term": pa.array(vocab)}),
        os.path.join(vdir, "postings", "part-0.parquet"),
    )
    ensure_infix_artifact(vdir)
    shutil.rmtree(os.path.join(vdir, "postings"))

    got = _infix_expand(vdir, [(0, "erge"), (1, "usto"), (2, "in"), (3, "xx")])
    assert got[0] == {"merge", "merged", "emerge"}
    assert got[1] == {"customer", "custom"}
    assert got[2] == {"in"}  # len<=n gram-equality path
    assert got[3] == set()


def test_filtered_search_is_filtered_subset(ray_session):
    """filter_by semantics: every hit satisfies the filter, scores equal
    the unfiltered scorer's score for that doc (collection-global BM25
    stats), and ranking is the filtered restriction of the full ranking."""
    import numpy as np
    import pyarrow.dataset as pads
    import os

    from pyf_aggregator_ray.pipelines.query import IndexReader
    from pyf_aggregator_ray.pipelines.registry import ensure_index
    from pyf_aggregator_ray.pipelines.searchplus import FilteredScorerStage
    from pyf_aggregator_ray.state import manifest as mf

    root = ensure_index(SF)
    stage = FilteredScorerStage(root)
    reader = IndexReader(root)
    vdir = mf.read_alias(root)
    docs = pads.dataset(os.path.join(vdir, "docs")).to_table(
        columns=["doc_id", "lang"]
    )
    en_ids = set(
        docs.filter(pads.field("lang") == "en")["doc_id"].to_pylist()
    )

    allowed = stage._allowed_ids("lang:=en")
    assert set(allowed.tolist()) == en_ids
    filtered = reader.score("merge sort", 10, allowed_ids=allowed)
    full = {d: s for _, d, s in reader.score("merge sort", 10**9)}
    expected = sorted(
        ((d, s) for d, s in full.items() if d in en_ids),
        key=lambda t: (-t[1], t[0]),
    )[:10]
    assert [(d, s) for _, d, s in filtered] == expected

    # AND conjunction + empty-filter behavior
    both = stage._allowed_ids("lang:=en && repo:=org/src1")
    sub = docs.filter(
        (pads.field("lang") == "en")
    )["doc_id"].to_pylist()
    assert set(both.tolist()) <= set(sub)
    assert reader.score("merge sort", 10, allowed_ids=np.empty(0, np.int64)) == []


def test_phrase_adjacency(ray_session):
    """Positional-intersect semantics: match_docs returns EXACTLY the docs
    whose token stream contains the phrase as a contiguous in-order
    subsequence (brute-force check over the raw corpus), including the
    cross-doc-boundary non-match and the single/absent-token edges."""
    import pyarrow.parquet as pq
    import re

    from pyf_aggregator_ray.pipelines.registry import ensure_index
    from pyf_aggregator_ray.pipelines.searchplus import (
        PhraseScorerStage,
        ensure_positions_artifact,
        _phrase_tokens,
    )
    from pyf_aggregator_ray.sources.corpus import read_corpus
    from pyf_aggregator_ray.state import manifest as mf

    root = ensure_index(SF)
    vdir = mf.read_alias(root)
    pos_path = ensure_positions_artifact(SF, vdir)
    stage = PhraseScorerStage(root, pos_path)

    corpus = read_corpus(SF).select_columns(["doc_id", "content"]).to_pandas()
    streams = {
        int(r.doc_id): re.findall("[a-z0-9]+", str(r.content).lower())
        for r in corpus.itertuples()
    }

    def brute(phrase: str) -> set[int]:
        toks = _phrase_tokens(phrase)
        if not toks:
            return set()
        return {
            d
            for d, ts in streams.items()
            if any(
                ts[i : i + len(toks)] == toks
                for i in range(len(ts) - len(toks) + 1)
            )
        }

    for phrase in (
        "merge sort",
        "of the",
        "customer value analysis",
        "data the",
        "nonexistentterm42 sort",
        "spark",
        "",
    ):
        got = set(stage.match_docs(phrase).tolist())
        assert got == brute(phrase), phrase


def test_grouped_search_collapse(ray_session):
    """group_by semantics: one hit per group, each group represented by
    its best-scoring doc (tiebreak doc_id), groups ranked by that score."""
    import pyarrow as pa

    from pyf_aggregator_ray.pipelines.query import IndexReader
    from pyf_aggregator_ray.pipelines.registry import ensure_index
    from pyf_aggregator_ray.pipelines.searchplus import GroupedScorerStage

    root = ensure_index(SF)
    stage = GroupedScorerStage(root)
    reader = IndexReader(root)
    batch = pa.table(
        {"query_id": [0], "query": ["customer value"], "k": [1000]}
    )
    out = stage(batch).to_pandas()
    assert out["repo"].is_unique
    # brute-force collapse from the exhaustive scorer
    id2g = dict(
        zip(stage._ids.tolist(), [stage._names[c] for c in stage._codes])
    )
    full = reader.score("customer value", 10**9)
    best: dict[str, tuple[int, float]] = {}
    for _, d, s in sorted(full, key=lambda t: (-t[2], t[1])):
        g = id2g[d]
        if g not in best:
            best[g] = (d, s)
    want = sorted(best.items(), key=lambda kv: (-kv[1][1], kv[1][0]))
    got = list(zip(out["repo"], zip(out["doc_id"], out["score"])))
    assert [g for g, _ in got] == [g for g, _ in want]
    assert [d for _, (d, _) in got] == [d for _, (d, _) in want]


def test_hybrid_rrf_semantics(ray_session):
    """RRF invariants on the real result: per-row score is exactly the
    two-list reciprocal-rank sum, the pure-vector query (absent text
    term) reproduces the ANN ranking verbatim, and ordering is
    round6(rrf) desc / doc_id asc with dense 1..n ranks."""
    import numpy as np

    from pyf_aggregator_ray.functions.rounding import round6
    from pyf_aggregator_ray.pipelines.hybrid import (
        HYBRID_QUERIES,
        RRF_K,
        hybrid_search,
    )
    from pyf_aggregator_ray.stages import ann as ann_stage
    import ray as _ray
    import ray.data as _rd

    out = hybrid_search(SF).to_pandas()

    # arithmetic: score == round6(sum of the present lists' 1/(K+r))
    contrib = np.where(out.text_rank > 0, 1.0 / (RRF_K + out.text_rank), 0.0)
    contrib = contrib + np.where(
        out.vec_rank > 0, 1.0 / (RRF_K + out.vec_rank), 0.0
    )
    assert (out.score.to_numpy() == round6(contrib)).all()
    assert ((out.text_rank > 0) | (out.vec_rank > 0)).all()

    # ordering + dense ranks per query
    for qid, g in out.groupby("query_id"):
        assert g["rank"].tolist() == list(range(1, len(g) + 1))
        key = list(zip(-g.score, g.doc_id))
        assert key == sorted(key)

    # the absent-term query is a pure vector ranking == ANN list
    qid, _text, qvec, k = HYBRID_QUERIES[2]
    emb = _rd.read_parquet(f"{SF}/embeddings.parquet")
    ann = ann_stage.brute_force_topk(emb, [qvec], k).to_pandas()
    got = out[out.query_id == qid]
    assert (got.text_rank == 0).all()
    assert got.doc_id.tolist() == ann.vec_id.tolist()
    assert got.vec_rank.tolist() == ann["rank"].tolist()


def test_hybrid_lsh_backend_recall(ray_session):
    """The LSH vector backend (scale path) fuses with the same RRF rule;
    per-query overlap@k vs the exact backend stays above the floor the
    bucketed candidate generator guarantees on this corpus."""
    from pyf_aggregator_ray.pipelines.hybrid import hybrid_search

    exact = hybrid_search(SF).to_pandas()
    lsh = hybrid_search(SF, vector_backend="lsh").to_pandas()
    assert set(lsh.columns) == set(exact.columns)
    overlaps = []
    for qid, g in exact.groupby("query_id"):
        e = set(g.doc_id)
        l = set(lsh[lsh.query_id == qid].doc_id)
        overlaps.append(len(e & l) / len(e))
    assert sum(overlaps) / len(overlaps) >= 0.7, overlaps
    # text-only rows are identical across backends (vector side absent)
    et = exact[(exact.vec_rank == 0)][["query_id", "doc_id", "text_rank"]]
    lt = lsh[(lsh.vec_rank == 0)][["query_id", "doc_id", "text_rank"]]
    merged = et.merge(lt, on=["query_id", "doc_id"], suffixes=("_e", "_l"))
    assert (merged.text_rank_e == merged.text_rank_l).all()


def test_negation_semantics(ray_session):
    """`-term` operator invariants: no surviving hit contains an
    excluded term, an absent exclusion is a no-op vs plain BM25, and
    self-exclusion yields zero hits."""
    import numpy as np

    from pyf_aggregator_ray.pipelines.query import IndexReader
    from pyf_aggregator_ray.pipelines.registry import ensure_index
    from pyf_aggregator_ray.pipelines.searchplus import (
        NegationScorerStage,
        parse_negation,
    )

    assert parse_negation("merge sort -python") == ("merge sort", ["python"])
    assert parse_negation("-a b -c") == ("b", ["a", "c"])
    assert parse_negation("plain") == ("plain", [])

    root = ensure_index(SF)
    stage = NegationScorerStage(root)
    reader = IndexReader(root)

    # every hit of "merge sort -python" is outside python's posting list
    excl = stage._excluded_ids(["python"])
    got = reader.score("merge sort", 10, excluded_ids=excl)
    assert all(d not in set(excl.tolist()) for _, d, _ in got)
    # absent exclusion is a no-op
    none_excl = stage._excluded_ids(["nonexistentterm42"])
    assert reader.score("customer value", 10, excluded_ids=none_excl) == \
        reader.score("customer value", 10)
    # self-exclusion kills everything
    self_excl = stage._excluded_ids(["merge"])
    assert reader.score("merge", 5, excluded_ids=self_excl) == []


def test_phrase_nextword_equals_positions_path(ray_session):
    """The next-word (bigram) phrase path must find EXACTLY the same
    matching docs as the positional-intersect path, on every phrase
    shape (adjacent pair, hot pair, 3-token, co-occur-not-adjacent,
    absent term, single token)."""
    from pyf_aggregator_ray.pipelines.registry import ensure_index
    from pyf_aggregator_ray.pipelines.searchplus import (
        PHRASE_QUERIES,
        PhraseScorerStage,
        ensure_nextword_artifact,
        ensure_positions_artifact,
    )
    from pyf_aggregator_ray.state import manifest as mf

    root = ensure_index(SF)
    vdir = mf.read_alias(root)
    pos = ensure_positions_artifact(SF, vdir)
    nw = ensure_nextword_artifact(SF, vdir)
    via_pos = PhraseScorerStage(root, pos)           # positions only
    via_nw = PhraseScorerStage(root, pos, None, nw)  # bigram path
    for _qid, phrase, _k in PHRASE_QUERIES + [(9, "value customer", 5)]:
        a = via_pos.match_docs(phrase).tolist()
        b = via_nw.match_docs(phrase).tolist()
        assert a == b, phrase
