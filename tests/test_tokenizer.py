"""Tokenizer semantics: reference separator behavior + DuckDB agreement.

The engine tokenizer (Arrow/RE2), the pytest naive tokenizer (Python re)
and the DuckDB oracle (``regexp_extract_all``) must agree byte-for-byte —
BM25 rank identity depends on it.
"""

import re

import duckdb
import pyarrow as pa

from pyf_aggregator_ray.functions.tokenizer import (
    doc_lengths,
    term_frequencies,
    tokenize_column,
    tokenize_query,
)

CASES = [
    "plone.api",
    "@plone/volto",
    "snake_case-and-dash",
    "Mixed CASE Words",
    "",
    "   ",
    "a.b.c.d/e@f-g_h",
    "unicode café naïve 中文 test",
    "numbers 123 mixed1a 2b3",
    "trailing.separator.",
    ".leading",
]


def naive_tokens(s: str) -> list[str]:
    return re.findall("[a-z0-9]+", s.lower())


def test_matches_python_re():
    toks = tokenize_column(pa.array(CASES)).to_pylist()
    for s, got in zip(CASES, toks):
        assert got == naive_tokens(s), s


def test_matches_duckdb():
    con = duckdb.connect()
    for s in CASES:
        (got,) = con.execute(
            "SELECT regexp_extract_all(lower(?), '[a-z0-9]+')", [s]
        ).fetchone()
        assert got == naive_tokens(s), s


def test_separator_semantics():
    # Typesense token_separators [".", "-", "_", "@", "/"] (db.py:241)
    toks = tokenize_column(pa.array(["plone.api", "@plone/volto", "x-y_z"]))
    assert toks.to_pylist() == [["plone", "api"], ["plone", "volto"], ["x", "y", "z"]]


def test_doc_lengths_and_tf():
    col = pa.array(["a a b", "", None, "b.b@b"])
    toks = tokenize_column(col)
    assert doc_lengths(toks).to_pylist() == [3, 0, 0, 3]
    tf = term_frequencies(toks, [5, 6, 7, 8]).sort_by(
        [("term", "ascending"), ("doc_id", "ascending")]
    )
    assert tf.to_pylist() == [
        {"term": "a", "doc_id": 5, "tf": 2},
        {"term": "b", "doc_id": 5, "tf": 1},
        {"term": "b", "doc_id": 8, "tf": 3},
    ]


def test_tokenize_query_distinct_sorted():
    assert tokenize_query("Data-stream/batch THE the data") == [
        "batch",
        "data",
        "stream",
        "the",
    ]
