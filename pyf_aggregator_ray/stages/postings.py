"""Posting-list construction: the groupby(term) shuffle, skew-aware.

The reference delegates inverted-index construction to Typesense's batch
import (``/root/reference/src/pyf/aggregator/indexer.py:39-63``); per the
north rule we build it from scratch as Ray Data stages:

  tokens (term, doc_id, tf, dl)
    -> salt: hot terms (Zipf head: 'import', 'def', ...) are split by
       doc-id RANGE so no group exceeds ``salt_range_docs`` postings;
       range salting (not hash salting) keeps every shard doc-id-sorted
       and disjoint, so the final merge is ordered concatenation — no
       k-way merge needed for delta-gap correctness
    -> partition key  part = H(term, salt) % P
    -> groupby("part").map_groups(encode_partition)    [the big shuffle]
         one call per partition encodes *all* its terms vectorized:
         one sort, run-length boundaries, one varint pass per stream
    -> groupby("merge_part").map_groups(merge_partition) [small shuffle of
         compressed shard rows — the "streaming aggregate" merge]

Output row per term: (term, df, cf, first_doc, last_doc,
gaps/tfs/dls varint streams).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.varint import (
    decode_varint,
    encode_varint_with_lengths,
)

POSTING_SCHEMA = pa.schema(
    [
        ("term", pa.string()),
        ("salt", pa.int64()),
        ("df", pa.int64()),
        ("cf", pa.int64()),
        ("first_doc", pa.int64()),
        ("last_doc", pa.int64()),
        ("gaps", pa.large_binary()),
        ("tfs", pa.large_binary()),
        ("dls", pa.large_binary()),
    ]
)


def stable_term_hash(terms: np.ndarray) -> np.ndarray:
    """Deterministic 64-bit hash of a string array (stable across processes
    and runs — Python's builtin ``hash`` is salted per process and must not
    be used for partitioning)."""
    return pd.util.hash_array(np.asarray(terms, dtype=object))


def add_salt_and_part(
    batch: pa.Table,
    hot_terms: frozenset[str],
    salt_range_docs: int,
    num_parts: int,
) -> pa.Table:
    """Append ``salt`` and ``part`` columns to a token batch."""
    terms = batch["term"].to_numpy(zero_copy_only=False)
    doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False)
    salt = np.zeros(len(terms), dtype=np.int64)
    if hot_terms:
        hot_mask = np.array([t in hot_terms for t in terms], dtype=bool)
        salt[hot_mask] = doc_ids[hot_mask] // salt_range_docs
    h = stable_term_hash(terms)
    part = ((h ^ (salt.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15))) %
            np.uint64(num_parts)).astype(np.int64)
    return batch.append_column("salt", pa.array(salt)).append_column(
        "part", pa.array(part)
    )


def _group_starts(sorted_terms: np.ndarray, sorted_salts: np.ndarray) -> np.ndarray:
    """Boundary indices of (term, salt) runs in sorted arrays."""
    if len(sorted_terms) == 0:
        return np.empty(0, dtype=np.int64)
    change = np.empty(len(sorted_terms), dtype=bool)
    change[0] = True
    change[1:] = (sorted_terms[1:] != sorted_terms[:-1]) | (
        sorted_salts[1:] != sorted_salts[:-1]
    )
    return np.flatnonzero(change)


def _binary_from_offsets(data: bytes, offsets: np.ndarray) -> pa.Array:
    """Zero-copy large_binary array over ``data`` sliced at ``offsets``."""
    return pa.LargeBinaryArray.from_buffers(
        pa.large_binary(),
        len(offsets) - 1,
        [None, pa.py_buffer(offsets.astype(np.int64).tobytes()), pa.py_buffer(data)],
    )


def encode_partition(tbl: pa.Table) -> pa.Table:
    """Encode every (term, salt) shard in one partition, fully vectorized.

    One Arrow sort + one varint pass per stream for the whole partition;
    per-term work is numpy slicing only. This keeps per-group Python
    overhead O(P), not O(vocabulary).
    """
    if tbl.num_rows == 0:
        return POSTING_SCHEMA.empty_table()
    tbl = tbl.sort_by(
        [("term", "ascending"), ("salt", "ascending"), ("doc_id", "ascending")]
    )
    terms = tbl["term"].to_numpy(zero_copy_only=False)
    salts = tbl["salt"].to_numpy(zero_copy_only=False)
    doc_ids = tbl["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    tfs = tbl["tf"].to_numpy(zero_copy_only=False).astype(np.int64)
    dls = tbl["dl"].to_numpy(zero_copy_only=False).astype(np.int64)

    starts = _group_starts(terms, salts)
    ends = np.concatenate([starts[1:], [len(terms)]])

    # delta-gap over the whole column, resetting at group starts to the
    # absolute doc id (the merge stage rewrites cross-shard boundaries)
    gaps = doc_ids.copy()
    gaps[1:] -= doc_ids[:-1]
    gaps[starts] = doc_ids[starts]

    gaps_buf, gaps_nb = encode_varint_with_lengths(gaps)
    tfs_buf, tfs_nb = encode_varint_with_lengths(tfs)
    dls_buf, dls_nb = encode_varint_with_lengths(dls)

    def offsets_for(nb: np.ndarray) -> np.ndarray:
        cum = np.concatenate(([0], np.cumsum(nb)))
        return np.concatenate((cum[starts], [cum[-1]]))

    df = (ends - starts).astype(np.int64)
    cf = np.add.reduceat(tfs, starts).astype(np.int64)
    return pa.table(
        {
            "term": pa.array(terms[starts], type=pa.string()),
            "salt": pa.array(salts[starts], type=pa.int64()),
            "df": pa.array(df),
            "cf": pa.array(cf),
            "first_doc": pa.array(doc_ids[starts]),
            "last_doc": pa.array(doc_ids[ends - 1]),
            "gaps": _binary_from_offsets(gaps_buf, offsets_for(gaps_nb)),
            "tfs": _binary_from_offsets(tfs_buf, offsets_for(tfs_nb)),
            "dls": _binary_from_offsets(dls_buf, offsets_for(dls_nb)),
        }
    )


def _first_varint_lengths(data: np.ndarray, row_starts: np.ndarray) -> np.ndarray:
    """Byte length of the FIRST varint of each row, vectorized: gather a
    10-byte window per row and find the first byte with the continuation
    bit clear (LEB128 uint64 is at most 10 bytes)."""
    if len(row_starts) == 0:
        return np.empty(0, dtype=np.int64)
    win = np.minimum(
        row_starts[:, None] + np.arange(10, dtype=np.int64)[None, :],
        len(data) - 1,
    )
    done = (data[win] & 0x80) == 0
    return np.argmax(done, axis=1).astype(np.int64) + 1


def merge_partition(tbl: pa.Table) -> pa.Table:
    """Merge shard rows into one posting row per term.

    Single-shard terms (the vast majority) pass through as ONE Arrow take
    — no per-row Python. Multi-shard (hot/salted) terms whose shards are
    DISJOINT doc-id intervals (range salting guarantees this) merge by
    pure BYTE ASSEMBLY — tfs/dls streams are one buffer slice per term,
    gap streams splice a re-encoded boundary varint per shard — with no
    posting decode at all: merge cost is O(bytes moved), not O(postings
    decoded), which is what keeps the hot-term merge cheap when every
    term has thousands of shards (a full decode/re-encode here measured
    ~100x slower on a 3M-doc corpus). Interleaved shard intervals (rare:
    non-contiguous doc-id layouts) take a vectorized decode -> (term,
    doc_id) lexsort -> re-encode path. Doc SETS must be disjoint across
    a term's shards; a duplicate doc id means a build bug and raises.
    """
    if tbl.num_rows == 0:
        return merged_schema().empty_table()
    tbl = tbl.sort_by([("term", "ascending"), ("first_doc", "ascending")])
    terms = tbl["term"].to_numpy(zero_copy_only=False)
    starts = _group_starts(terms, np.zeros(len(terms), dtype=np.int64))
    ends = np.concatenate([starts[1:], [len(terms)]])
    sizes = ends - starts

    single_tbl = tbl.take(
        pa.array(starts[sizes == 1], type=pa.int64())
    ).select(merged_schema().names)
    if not np.any(sizes > 1):
        return single_tbl

    first_arr = tbl["first_doc"].to_numpy(zero_copy_only=False)
    last_arr = tbl["last_doc"].to_numpy(zero_copy_only=False)
    df_arr = tbl["df"].to_numpy(zero_copy_only=False)
    cf_arr = tbl["cf"].to_numpy(zero_copy_only=False)

    # row-level interval order, forced True at run starts; a term run is
    # disjoint iff every row in it is ordered after its predecessor
    ordered = np.ones(len(terms), dtype=bool)
    ordered[1:] = first_arr[1:] > last_arr[:-1]
    ordered[starts] = True
    run_disjoint = np.logical_and.reduceat(ordered, starts)

    multi = sizes > 1
    out_parts = [single_tbl.cast(merged_schema())]

    # ---- disjoint multi-shard terms: byte assembly, no decode ----
    dis = multi & run_disjoint
    if np.any(dis):
        d_starts, d_ends = starts[dis], ends[dis]
        row_idx = np.concatenate(
            [np.arange(s, e) for s, e in zip(d_starts, d_ends)]
        )
        sub = tbl.take(pa.array(row_idx, type=pa.int64()))
        nrun = len(d_starts)
        run_sizes = d_ends - d_starts
        sub_starts = np.concatenate(([0], np.cumsum(run_sizes)[:-1]))
        sub_ends = np.cumsum(run_sizes)

        gaps_data = _column_bytes(sub["gaps"])
        tfs_data = _column_bytes(sub["tfs"])
        dls_data = _column_bytes(sub["dls"])

        # per-row byte ranges inside the concatenated streams: cheap to
        # recompute from binary lengths (binary_length is vectorized)
        def col_offsets(col) -> np.ndarray:
            arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
            lens = pc.binary_length(arr).to_numpy(zero_copy_only=False).astype(np.int64)
            return np.concatenate(([0], np.cumsum(lens)))

        g_offs = col_offsets(sub["gaps"])
        t_offs = col_offsets(sub["tfs"])
        d_offs = col_offsets(sub["dls"])

        sfirst = first_arr[row_idx]
        slast = last_arr[row_idx]
        # boundary gap value for every non-initial shard row
        non_init = np.ones(len(row_idx), dtype=bool)
        non_init[sub_starts] = False
        ni_idx = np.flatnonzero(non_init)
        bvals = (sfirst[ni_idx] - slast[ni_idx - 1]).astype(np.uint64)
        bbuf, bnb = encode_varint_with_lengths(bvals)
        b_offs = np.concatenate(([0], np.cumsum(bnb)))
        bbytes = np.frombuffer(bbuf, dtype=np.uint8)
        fvlen = np.zeros(len(row_idx), dtype=np.int64)
        fvlen[ni_idx] = _first_varint_lengths(gaps_data, g_offs[ni_idx])

        # assemble gap streams: per row either its full bytes (initial
        # shard) or boundary varint + rest; pieces are buffer SLICES
        pieces: list[np.ndarray] = []
        bpos = 0
        for i in range(len(row_idx)):
            if non_init[i]:
                pieces.append(bbytes[b_offs[bpos] : b_offs[bpos + 1]])
                bpos += 1
                pieces.append(gaps_data[g_offs[i] + fvlen[i] : g_offs[i + 1]])
            else:
                pieces.append(gaps_data[g_offs[i] : g_offs[i + 1]])
        gaps_out = (
            np.concatenate(pieces) if pieces else np.empty(0, dtype=np.uint8)
        )
        # output byte length per row is fully determined without decoding
        row_lens = g_offs[1:] - g_offs[:-1]
        out_row_lens = row_lens.copy()
        out_row_lens[ni_idx] += bnb - fvlen[ni_idx]
        out_cum = np.concatenate(([0], np.cumsum(out_row_lens)))
        g_out_offs = np.concatenate((out_cum[sub_starts], [out_cum[-1]]))
        dis_tbl = pa.table(
            {
                "term": pa.array(terms[d_starts], type=pa.string()),
                "df": pa.array(
                    np.add.reduceat(df_arr, starts)[dis].astype(np.int64)
                ),
                "cf": pa.array(
                    np.add.reduceat(cf_arr, starts)[dis].astype(np.int64)
                ),
                "first_doc": pa.array(first_arr[d_starts]),
                "last_doc": pa.array(last_arr[d_ends - 1]),
                "gaps": _binary_from_offsets(gaps_out, g_out_offs),
                "tfs": _binary_from_offsets(
                    np.ascontiguousarray(tfs_data),
                    np.concatenate((t_offs[sub_starts], [t_offs[-1]])),
                ),
                "dls": _binary_from_offsets(
                    np.ascontiguousarray(dls_data),
                    np.concatenate((d_offs[sub_starts], [d_offs[-1]])),
                ),
            }
        )
        out_parts.append(dis_tbl)

    # ---- interleaved multi-shard terms (rare): decode + re-encode ----
    inter = multi & ~run_disjoint
    if np.any(inter):
        i_starts, i_ends = starts[inter], ends[inter]
        row_idx = np.concatenate(
            [np.arange(s, e) for s, e in zip(i_starts, i_ends)]
        )
        sub = tbl.take(pa.array(row_idx, type=pa.int64()))
        counts, ids, tfs, dls = decode_posting_batch(sub)
        tgrp_of_row = np.repeat(np.arange(len(i_starts)), (i_ends - i_starts))
        tgrp = np.repeat(tgrp_of_row, counts)
        order = np.lexsort((ids, tgrp))
        ids, tfs, dls, tgrp = ids[order], tfs[order], dls[order], tgrp[order]
        vstarts = np.flatnonzero(np.concatenate(([True], tgrp[1:] != tgrp[:-1])))
        vends = np.concatenate([vstarts[1:], [len(ids)]])
        d_ok = np.ones(len(ids), dtype=bool)
        d_ok[1:] = np.diff(ids) > 0
        d_ok[vstarts] = True
        if not d_ok.all():
            bad = tgrp[np.flatnonzero(~d_ok)[0]]
            raise ValueError(
                f"duplicate doc ids across shards for term "
                f"{terms[i_starts[bad]]!r}"
            )
        gaps = ids.astype(np.uint64).copy()
        gaps[1:] -= ids[:-1].astype(np.uint64)
        gaps[vstarts] = ids[vstarts].astype(np.uint64)
        gaps_buf, gaps_nb = encode_varint_with_lengths(gaps)
        tfs_buf, tfs_nb = encode_varint_with_lengths(tfs.astype(np.uint64))
        dls_buf, dls_nb = encode_varint_with_lengths(dls.astype(np.uint64))

        def offsets_for(nb: np.ndarray) -> np.ndarray:
            cum = np.concatenate(([0], np.cumsum(nb)))
            return np.concatenate((cum[vstarts], [cum[-1]]))

        out_parts.append(
            pa.table(
                {
                    "term": pa.array(terms[i_starts], type=pa.string()),
                    "df": pa.array((vends - vstarts).astype(np.int64)),
                    "cf": pa.array(np.add.reduceat(tfs, vstarts).astype(np.int64)),
                    "first_doc": pa.array(ids[vstarts]),
                    "last_doc": pa.array(ids[vends - 1]),
                    "gaps": _binary_from_offsets(gaps_buf, offsets_for(gaps_nb)),
                    "tfs": _binary_from_offsets(tfs_buf, offsets_for(tfs_nb)),
                    "dls": _binary_from_offsets(dls_buf, offsets_for(dls_nb)),
                }
            )
        )

    merged = pa.concat_tables(out_parts)
    return merged.take(
        pa.array(np.argsort(merged["term"].to_numpy(zero_copy_only=False), kind="stable"), type=pa.int64())
    )


def merged_schema() -> pa.Schema:
    return pa.schema(
        [
            ("term", pa.string()),
            ("df", pa.int64()),
            ("cf", pa.int64()),
            ("first_doc", pa.int64()),
            ("last_doc", pa.int64()),
            ("gaps", pa.large_binary()),
            ("tfs", pa.large_binary()),
            ("dls", pa.large_binary()),
        ]
    )


def decode_posting_row(row: dict) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(doc_ids, tfs, dls) arrays for one merged posting row."""
    doc_ids = np.cumsum(decode_varint(row["gaps"]), dtype=np.uint64)
    return doc_ids.astype(np.int64), decode_varint(row["tfs"]).astype(
        np.int64
    ), decode_varint(row["dls"]).astype(np.int64)


def _column_bytes(col: "pa.ChunkedArray | pa.Array") -> np.ndarray:
    """One contiguous uint8 stream = the column's binary cells, in row
    order, zero-copy per chunk (Arrow binary offsets are monotonic, so
    each chunk's cells are back-to-back in its data buffer)."""
    chunks = col.chunks if isinstance(col, pa.ChunkedArray) else [col]
    parts = []
    for c in chunks:
        if len(c) == 0:
            continue
        width = np.int64 if pa.types.is_large_binary(c.type) else np.int32
        offs = np.frombuffer(c.buffers()[1], dtype=width)[
            c.offset : c.offset + len(c) + 1
        ]
        data = np.frombuffer(c.buffers()[2], dtype=np.uint8)
        parts.append(data[offs[0] : offs[-1]])
    if not parts:
        return np.empty(0, dtype=np.uint8)
    return parts[0] if len(parts) == 1 else np.concatenate(parts)


def decode_posting_batch(
    tbl: pa.Table,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Decode MANY posting rows in one vectorized pass (no per-row
    ``.as_py()``): returns (counts, doc_ids, tfs, dls) where ``counts[i]``
    is row i's posting count and the value arrays are row-concatenated
    (row i's values live at ``[cumsum(counts)[i-1] : cumsum(counts)[i]``).

    Varint streams are self-delimiting, so decoding the concatenation of
    all rows' streams equals the concatenation of per-row decodes; the
    delta-gap cumsum is then segmented (reset to the absolute first doc id
    at each row start).
    """
    counts = tbl["df"].to_numpy(zero_copy_only=False).astype(np.int64)
    gaps = decode_varint(_column_bytes(tbl["gaps"]))
    tfs = decode_varint(_column_bytes(tbl["tfs"]))
    dls = decode_varint(_column_bytes(tbl["dls"]))
    total = int(counts.sum())
    if not (len(gaps) == len(tfs) == len(dls) == total):
        raise ValueError(
            f"posting decode mismatch: df sum {total} vs "
            f"{len(gaps)}/{len(tfs)}/{len(dls)} decoded values"
        )
    starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
    cs = np.cumsum(gaps, dtype=np.uint64)
    base = np.zeros(len(counts), dtype=np.uint64)
    nz = counts > 0
    base[nz] = cs[starts[nz]] - gaps[starts[nz]]
    ids = cs - np.repeat(base, counts)
    return counts, ids.astype(np.int64), tfs.astype(np.int64), dls.astype(np.int64)
