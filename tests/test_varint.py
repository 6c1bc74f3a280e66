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


# ---------------------------------------------------------------------------
# batched posting-row decode (stages.postings.decode_posting_batch)
# ---------------------------------------------------------------------------


def test_decode_posting_batch_roundtrip():
    """Batched decode of many posting rows == per-row decode."""
    import numpy as np
    import pyarrow as pa

    from pyf_aggregator_ray.functions.varint import encode_posting_list
    from pyf_aggregator_ray.stages.postings import (
        decode_posting_batch,
        decode_posting_row,
    )

    rng = np.random.default_rng(7)
    rows = []
    for _ in range(37):
        n = int(rng.integers(1, 40))
        ids = np.sort(rng.choice(10_000, size=n, replace=False)).astype(np.int64)
        tfs = rng.integers(1, 300, size=n).astype(np.int64)
        dls = rng.integers(1, 5_000, size=n).astype(np.int64)
        g, t, d = encode_posting_list(ids, tfs, dls)
        rows.append((n, ids, tfs, dls, g, t, d))
    tbl = pa.table(
        {
            "df": pa.array([r[0] for r in rows], type=pa.int64()),
            "gaps": pa.array([r[4] for r in rows], type=pa.large_binary()),
            "tfs": pa.array([r[5] for r in rows], type=pa.large_binary()),
            "dls": pa.array([r[6] for r in rows], type=pa.large_binary()),
        }
    )
    counts, ids_all, tfs_all, dls_all = decode_posting_batch(tbl)
    assert counts.tolist() == [r[0] for r in rows]
    ends = np.cumsum(counts)
    starts = ends - counts
    for i, (_n, ids, tfs, dls, g, t, d) in enumerate(rows):
        s, e = starts[i], ends[i]
        np.testing.assert_array_equal(ids_all[s:e], ids)
        np.testing.assert_array_equal(tfs_all[s:e], tfs)
        np.testing.assert_array_equal(dls_all[s:e], dls)
        rids, rtfs, rdls = decode_posting_row({"gaps": g, "tfs": t, "dls": d})
        np.testing.assert_array_equal(ids_all[s:e], rids)


def test_decode_posting_batch_chunked_and_sliced():
    """Chunked and sliced binary columns decode identically (zero-copy
    offsets path must honor array offsets)."""
    import numpy as np
    import pyarrow as pa

    from pyf_aggregator_ray.functions.varint import encode_posting_list
    from pyf_aggregator_ray.stages.postings import decode_posting_batch

    rows = []
    for ids in ([1, 5, 9], [2], [100, 200, 300, 400]):
        a = np.array(ids, dtype=np.int64)
        g, t, d = encode_posting_list(a, a + 1, a + 2)
        rows.append((len(ids), g, t, d))
    full = pa.table(
        {
            "df": pa.array([r[0] for r in rows], type=pa.int64()),
            "gaps": pa.array([r[1] for r in rows], type=pa.large_binary()),
            "tfs": pa.array([r[2] for r in rows], type=pa.large_binary()),
            "dls": pa.array([r[3] for r in rows], type=pa.large_binary()),
        }
    )
    # chunked: concat of two slices; sliced: middle row only
    chunked = pa.concat_tables([full.slice(0, 1), full.slice(1, 2)])
    counts, ids_all, _, _ = decode_posting_batch(chunked)
    assert counts.tolist() == [3, 1, 4]
    assert ids_all.tolist() == [1, 5, 9, 2, 100, 200, 300, 400]
    sliced = full.slice(1, 1)
    counts, ids_all, tfs_all, dls_all = decode_posting_batch(sliced)
    assert counts.tolist() == [1]
    assert ids_all.tolist() == [2]
    assert tfs_all.tolist() == [3]
    assert dls_all.tolist() == [4]
