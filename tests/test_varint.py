"""Round-trip tests for the varint / delta-gap codec (north rule:
'compression round-trips')."""

import numpy as np
import pytest

from pyf_aggregator_ray.functions.varint import (
    decode_posting_list,
    decode_varint,
    delta_decode,
    delta_encode,
    encode_posting_list,
    encode_varint,
    encode_varint_with_lengths,
)


def test_empty():
    assert encode_varint(np.array([], dtype=np.uint64)) == b""
    assert len(decode_varint(b"")) == 0


@pytest.mark.parametrize(
    "values",
    [
        [0],
        [1],
        [127],
        [128],
        [0, 0, 0],
        [2**32, 2**63 - 1, 2**64 - 1],
        list(range(1000)),
    ],
)
def test_round_trip_known(values):
    arr = np.array(values, dtype=np.uint64)
    assert np.array_equal(decode_varint(encode_varint(arr)), arr)


def test_round_trip_random():
    rng = np.random.default_rng(42)
    for _ in range(20):
        n = int(rng.integers(1, 5000))
        # mixed magnitudes exercise 1..10-byte encodings
        magnitudes = rng.integers(0, 64, size=n).astype(np.uint64)
        arr = rng.integers(0, 2**63 - 1, size=n).astype(np.uint64) >> magnitudes
        assert np.array_equal(decode_varint(encode_varint(arr)), arr)


def test_lengths_sum_to_buffer():
    arr = np.array([0, 127, 128, 16384, 2**40], dtype=np.uint64)
    buf, nb = encode_varint_with_lengths(arr)
    assert nb.sum() == len(buf)
    assert list(nb) == [1, 1, 2, 3, 6]


def test_single_byte_values_compact():
    arr = np.arange(128, dtype=np.uint64)
    assert len(encode_varint(arr)) == 128


def test_delta_round_trip():
    ids = np.array([3, 10, 11, 500, 10**12], dtype=np.uint64)
    assert np.array_equal(delta_decode(delta_encode(ids)), ids)


def test_posting_list_round_trip_sorts():
    rng = np.random.default_rng(7)
    doc_ids = rng.choice(10**9, size=500, replace=False)
    tfs = rng.integers(1, 100, size=500)
    dls = rng.integers(1, 10_000, size=500)
    g, t, d = encode_posting_list(doc_ids, tfs, dls)
    ids2, tfs2, dls2 = decode_posting_list(g, t, d)
    order = np.argsort(doc_ids)
    assert np.array_equal(ids2, np.sort(doc_ids))
    assert np.array_equal(tfs2, tfs[order])
    assert np.array_equal(dls2, dls[order])
