"""Property-based round-trips (hypothesis) for the codec and tokenizer —
the north rule's 'compression round-trips' under adversarial inputs."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from pyf_aggregator_ray.functions.varint import (
    decode_varint,
    delta_decode,
    delta_encode,
    encode_varint,
)


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**64 - 1), max_size=500))
def test_varint_round_trip(values):
    arr = np.array(values, dtype=np.uint64)
    assert np.array_equal(decode_varint(encode_varint(arr)), arr)


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.integers(min_value=0, max_value=2**62), min_size=1, max_size=300, unique=True
    )
)
def test_delta_gap_round_trip(ids):
    arr = np.array(sorted(ids), dtype=np.uint64)
    assert np.array_equal(delta_decode(delta_encode(arr)), arr)


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=300))
def test_tokenizer_three_way_agreement(text):
    """Arrow RE2, Python re, and DuckDB RE2 tokenize identically."""
    import re

    import duckdb
    import pyarrow as pa

    from pyf_aggregator_ray.functions.tokenizer import tokenize_column

    arrow_toks = tokenize_column(pa.array([text])).to_pylist()[0]
    py_toks = re.findall("[a-z0-9]+", text.lower())
    assert arrow_toks == py_toks
    con = duckdb.connect()
    (duck_toks,) = con.execute(
        "SELECT regexp_extract_all(lower(?), '[a-z0-9]+')", [text]
    ).fetchone()
    # case-folding of exotic unicode may differ between Python and utf8proc;
    # restrict the assertion to the tokens' join (documents are code/text)
    if text.isascii():
        assert duck_toks == py_toks
