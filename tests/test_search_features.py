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
    "typo_search",
    "typo_search2",
    "weighted_field_search",
    "incremental_term_stats",
    "delete_lang_term_stats",
    "refresh_merge_docs",
    "top_contributors",
    "npm_version_expansion",
    "embedding_near_dup",
    "media_audio_features",
    "corpus_curation",
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
