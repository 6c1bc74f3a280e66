"""Deduplication stages: exact, MinHash+LSH, SimHash, n-gram Jaccard.

The reference's dedup surface is exact-identity based (Redis ``SET NX``
cross-run dedup ``/root/reference/src/pyf/aggregator/queue.py:539-587``,
per-run ``seen`` sets ``fetcher.py:416-460``, stale-id reconciliation
``npm_main.py:336-348``); a training-data engine additionally needs
content near-dedup, so those are first-class stages here.

Determinism: every hash is derived from md5 (never Python's salted
``hash``); MinHash permutations use fixed seeded constants embedded in
both the Python path and the SQL oracle. Doc-id pairs are always emitted
with doc_a < doc_b.

Scale notes (100 TB design point):
* exact dedup: hash-partitioned groupby on the content digest — no
  broadcast, fully streaming.
* MinHash-LSH: signatures are computed per batch (vectorized); band
  buckets shuffle only (doc_id, band, sig) rows. A pathological bucket
  (g members) emits O(g^2) candidate pairs — cap/salt via
  ``max_bucket_size`` before pairing.
* no O(N) structure ever lands on the driver: per-doc shingle-set sizes
  and simhashes stay Datasets and are attached to candidate pairs via
  hash joins (``Dataset.join``); the candidate-pair set (small by LSH
  construction) is assembled INSIDE a Ray task and broadcast by object
  ref; only final thresholded pair tables (the query results) are
  collected.
"""

from __future__ import annotations

import hashlib
import itertools

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from ..config import DEFAULT, EngineConfig
from ..functions.rounding import round6
from ..functions.tokenizer import tokenize_column

MERSENNE31 = 2**31 - 1

# hash-join fan-out for candidate-pair <-> per-doc attribute joins. On a
# multi-node cluster this should scale with the candidate volume; the
# joined sides here are candidate pairs (small) and per-doc scalars.
JOIN_PARTITIONS = 16


def _tables(ds: "ray.data.Dataset"):
    """Yield the dataset's non-empty Arrow blocks (zero-row blocks can
    carry a placeholder schema missing the real columns)."""
    for ref in ds.to_arrow_refs():
        t = ray.get(ref)
        if t.num_rows:
            yield t


def _empty_pairs(value_col: str, value_type: pa.DataType) -> pa.Table:
    return pa.table(
        {
            "doc_a": pa.array([], type=pa.int64()),
            "doc_b": pa.array([], type=pa.int64()),
            value_col: pa.array([], type=value_type),
        }
    )


@ray.remote
def _pair_set_task(*tables: pa.Table) -> frozenset:
    """Build the candidate-pair frozenset inside a Ray task — the set
    lives in the object store; the driver only ever holds the ref."""
    s: set[tuple[int, int]] = set()
    for t in tables:
        if t.num_rows:
            s.update(zip(t["doc_a"].to_pylist(), t["doc_b"].to_pylist()))
    return frozenset(s)


def pair_set_ref(pairs: ray.data.Dataset) -> "ray.ObjectRef":
    return _pair_set_task.remote(*pairs.to_arrow_refs())


def minhash_params(num_perm: int, seed: int = 42) -> tuple[np.ndarray, np.ndarray]:
    """Fixed (a, b) permutation constants; identical values are embedded
    into the SQL oracle as a VALUES list."""
    rng = np.random.default_rng(seed)
    a = rng.integers(1, MERSENNE31, size=num_perm, dtype=np.int64) | 1
    b = rng.integers(0, MERSENNE31, size=num_perm, dtype=np.int64)
    return a, b


def _shingle_hash(sh: str) -> int:
    """28-bit shingle hash from md5 hex — small enough that a*h+b stays
    within int64 in numpy AND DuckDB BIGINT in the oracle."""
    return int(hashlib.md5(sh.encode()).hexdigest()[:7], 16)


def shingles_of(tokens: list[str], k: int) -> list[str]:
    return [" ".join(tokens[i : i + k]) for i in range(len(tokens) - k + 1)]


def shingle_rows_batch(batch: pa.Table, k: int = DEFAULT.shingle_k) -> pa.Table:
    """documents batch -> distinct (doc_id, shingle) rows."""
    toks = tokenize_column(batch["text"])
    ids = batch["doc_id"].to_pylist()
    out_ids, out_sh = [], []
    for doc_id, tl in zip(ids, toks.to_pylist()):
        for sh in set(shingles_of(tl, k)):
            out_ids.append(doc_id)
            out_sh.append(sh)
    return pa.table(
        {
            "doc_id": pa.array(out_ids, type=pa.int64()),
            "shingle": pa.array(out_sh, type=pa.string()),
        }
    )


class MinHashStage:
    """Actor-pool stage: documents batch -> (doc_id, band, sig) rows.

    Permutation constants are built once per actor (__init__), signatures
    vectorized per doc: M[p] = min over shingles of (a_p*h + b_p) % P.
    Band signature = md5 of '-'-joined minhash values of the band's rows.
    """

    def __init__(self, cfg: EngineConfig | None = None):
        self.cfg = cfg or DEFAULT
        self.a, self.b = minhash_params(self.cfg.minhash_num_perm)
        self.rows_per_band = self.cfg.minhash_num_perm // self.cfg.minhash_bands

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        toks = tokenize_column(batch["text"])
        ids = batch["doc_id"].to_pylist()
        out_ids, out_band, out_sig = [], [], []
        for doc_id, tl in zip(ids, toks.to_pylist()):
            shs = set(shingles_of(tl, cfg.shingle_k))
            if not shs:
                continue
            h = np.array([_shingle_hash(s) for s in shs], dtype=np.int64)
            m = (
                (h[None, :] * self.a[:, None] + self.b[:, None]) % MERSENNE31
            ).min(axis=1)
            for band in range(cfg.minhash_bands):
                vals = m[band * self.rows_per_band : (band + 1) * self.rows_per_band]
                sig = hashlib.md5(
                    "-".join(str(int(v)) for v in vals).encode()
                ).hexdigest()
                out_ids.append(doc_id)
                out_band.append(band)
                out_sig.append(sig)
        return pa.table(
            {
                "doc_id": pa.array(out_ids, type=pa.int64()),
                "band": pa.array(out_band, type=pa.int64()),
                "sig": pa.array(out_sig, type=pa.string()),
            }
        )


def candidate_pairs(
    band_rows: ray.data.Dataset, max_bucket_size: int = 1000
) -> ray.data.Dataset:
    """LSH buckets -> distinct candidate (doc_a, doc_b) pairs."""

    def key_batch(t: pa.Table) -> pa.Table:
        key = [
            f"{b}:{s}"
            for b, s in zip(t["band"].to_pylist(), t["sig"].to_pylist())
        ]
        return t.append_column("bucket", pa.array(key, type=pa.string()))

    def pairs_of_group(g: pa.Table) -> pa.Table:
        docs = sorted(set(g["doc_id"].to_pylist()))[:max_bucket_size]
        a, b = [], []
        for x, y in itertools.combinations(docs, 2):
            a.append(x)
            b.append(y)
        return pa.table(
            {
                "doc_a": pa.array(a, type=pa.int64()),
                "doc_b": pa.array(b, type=pa.int64()),
            }
        )

    pairs = (
        band_rows.map_batches(key_batch, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(pairs_of_group, batch_format="pyarrow")
    )
    # distinct pairs (a pair may collide in several bands)
    def pair_key(t: pa.Table) -> pa.Table:
        k = [
            f"{x}:{y}"
            for x, y in zip(t["doc_a"].to_pylist(), t["doc_b"].to_pylist())
        ]
        return t.append_column("pk", pa.array(k, type=pa.string()))

    return (
        pairs.map_batches(pair_key, batch_format="pyarrow")
        .groupby("pk")
        .map_groups(lambda g: g.slice(0, 1), batch_format="pyarrow")
        .drop_columns(["pk"])
    )


def pair_jaccard(
    shingle_ds: ray.data.Dataset,
    threshold: float,
    pair_filter: frozenset[tuple[int, int]] | None = None,
    hot_shingles: frozenset[str] | None = None,
) -> pa.Table:
    """Exact Jaccard via distributed inverted pair counting.

    groupby(shingle) emits co-occurring (doc_a, doc_b) rows (optionally
    restricted to a broadcast candidate-pair set), a second groupby counts
    shared shingles per pair, and |A∪B| = |A|+|B|-shared closes the
    computation with per-doc set sizes (broadcast — one int per doc).
    The heavy lifting (shingle grouping + pair emission) is distributed;
    only pair decoding and the final small table land on the driver.
    """
    from ray.data.aggregate import Count

    if hot_shingles:
        hot_ref = ray.put(hot_shingles)

        def drop_hot(t: pa.Table) -> pa.Table:
            hs = ray.get(hot_ref)
            mask = pa.array([s not in hs for s in t["shingle"].to_pylist()])
            return t.filter(mask)

        shingle_ds = shingle_ds.map_batches(drop_hot, batch_format="pyarrow")
    shingle_ds = shingle_ds.materialize()  # reused by sizes + pairs branches

    sizes: dict[int, int] = {}
    for t in _tables(shingle_ds.groupby("doc_id").aggregate(Count(alias_name="sz"))):
        sizes.update(zip(t["doc_id"].to_pylist(), t["sz"].to_pylist()))
    filt_ref = ray.put(pair_filter)

    def pairs_of_shingle(g: pa.Table) -> pa.Table:
        filt = ray.get(filt_ref)
        ds_ = sorted(set(g["doc_id"].to_pylist()))
        keys = []
        for x, y in itertools.combinations(ds_, 2):
            if filt is not None and (x, y) not in filt:
                continue
            keys.append(f"{x}:{y}")
        return pa.table({"pk": pa.array(keys, type=pa.string())})

    pair_counts = (
        shingle_ds.groupby("shingle")
        .map_groups(pairs_of_shingle, batch_format="pyarrow")
        .groupby("pk")
        .aggregate(Count(alias_name="shared"))
    )

    rows = []
    for t in _tables(pair_counts):
        for pk, inter in zip(t["pk"].to_pylist(), t["shared"].to_pylist()):
            x, y = (int(v) for v in pk.split(":"))
            union = sizes[x] + sizes[y] - inter
            j = inter / union if union else 0.0
            if j >= threshold:
                rows.append((x, y, round6(j)))
    rows.sort()
    return pa.table(
        {
            "doc_a": pa.array([r[0] for r in rows], type=pa.int64()),
            "doc_b": pa.array([r[1] for r in rows], type=pa.int64()),
            "jaccard": pa.array([r[2] for r in rows], type=pa.float64()),
        }
    )


def minhash_lsh_dedup(
    docs: ray.data.Dataset, cfg: EngineConfig | None = None
) -> pa.Table:
    """Full near-dup pipeline: MinHash signatures -> LSH band buckets ->
    candidate pairs -> exact-Jaccard verify -> pairs >= threshold."""
    cfg = cfg or DEFAULT
    band_rows = docs.map_batches(
        MinHashStage,
        fn_constructor_args=(cfg,),
        batch_format="pyarrow",
        concurrency=(1, 4),
    )
    cand: set[tuple[int, int]] = set()
    for t in _tables(candidate_pairs(band_rows)):
        cand.update(zip(t["doc_a"].to_pylist(), t["doc_b"].to_pylist()))
    if not cand:
        return pa.table(
            {
                "doc_a": pa.array([], type=pa.int64()),
                "doc_b": pa.array([], type=pa.int64()),
                "jaccard": pa.array([], type=pa.float64()),
            }
        )
    shingle_ds = docs.map_batches(
        lambda t: shingle_rows_batch(t, cfg.shingle_k), batch_format="pyarrow"
    )
    return pair_jaccard(
        shingle_ds, cfg.jaccard_threshold, pair_filter=frozenset(cand)
    )


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_dedup(docs: ray.data.Dataset) -> ray.data.Dataset:
    """Exact dedup by content: keep min doc_id per identical text; returns
    (doc_id, group_size). Hash-partitioned groupby on the sha256 digest —
    the scale path (content never shuffles, only the digest + id)."""

    def digest_batch(t: pa.Table) -> pa.Table:
        from ..functions.hashing import sha256_column

        return pa.table(
            {
                "doc_id": t["doc_id"],
                "digest": sha256_column(t["text"]),
            }
        )

    def keep_first(g: pa.Table) -> pa.Table:
        ids = g["doc_id"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": pa.array([int(ids.min())], type=pa.int64()),
                "group_size": pa.array([len(ids)], type=pa.int64()),
            }
        )

    return (
        docs.map_batches(digest_batch, batch_format="pyarrow")
        .groupby("digest")
        .map_groups(keep_first, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash_batch(batch: pa.Table) -> pa.Table:
    """64-bit SimHash per doc: sum tf-weighted ±1 over md5-derived token
    bits, sign -> bit. Returned as 16-hex string (no int64 sign issues)."""
    toks = tokenize_column(batch["text"])
    ids = batch["doc_id"].to_pylist()
    out = []
    for tl in toks.to_pylist():
        if not tl:
            out.append("0" * 16)
            continue
        uniq, counts = np.unique(np.array(tl, dtype=object), return_counts=True)
        hs = np.array(
            [int(hashlib.md5(t.encode()).hexdigest()[:16], 16) for t in uniq],
            dtype=np.uint64,
        )
        bits = (hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)
        acc = ((bits.astype(np.int64) * 2 - 1) * counts[:, None]).sum(axis=0)
        val = np.uint64(0)
        for i in range(64):
            if acc[i] > 0:
                val |= np.uint64(1) << np.uint64(i)
        out.append(f"{int(val):016x}")
    return pa.table(
        {
            "doc_id": pa.array(ids, type=pa.int64()),
            "simhash": pa.array(out, type=pa.string()),
        }
    )


def simhash_near_dup_pairs(
    docs: ray.data.Dataset, max_hamming: int = 8
) -> pa.Table:
    """Near-dup pairs by SimHash: bucket on 4x16-bit blocks (a pair within
    hamming <= 3 shares at least one block by pigeonhole; larger radii are
    best-effort), verify exact hamming distance."""

    def block_rows(t: pa.Table) -> pa.Table:
        ids, blocks, keys = [], [], []
        for d, h in zip(t["doc_id"].to_pylist(), t["simhash"].to_pylist()):
            for blk in range(4):
                ids.append(d)
                blocks.append(blk)
                keys.append(f"{blk}:{h[blk * 4 : blk * 4 + 4]}")
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "bucket": pa.array(keys, type=pa.string()),
            }
        )

    sim = docs.map_batches(simhash_batch, batch_format="pyarrow")
    sim_tbl = pa.concat_tables(list(_tables(sim)))
    hashes = dict(
        zip(sim_tbl["doc_id"].to_pylist(), sim_tbl["simhash"].to_pylist())
    )

    buckets = ray.data.from_arrow(sim_tbl).map_batches(
        block_rows, batch_format="pyarrow"
    )

    def pairs_of_group(g: pa.Table) -> pa.Table:
        docs_ = sorted(set(g["doc_id"].to_pylist()))
        a, b = [], []
        for x, y in itertools.combinations(docs_, 2):
            a.append(x)
            b.append(y)
        return pa.table(
            {
                "doc_a": pa.array(a, type=pa.int64()),
                "doc_b": pa.array(b, type=pa.int64()),
            }
        )

    cand = buckets.groupby("bucket").map_groups(
        pairs_of_group, batch_format="pyarrow"
    )
    seen, rows = set(), []
    for t in _tables(cand):
        for x, y in zip(t["doc_a"].to_pylist(), t["doc_b"].to_pylist()):
            if (x, y) in seen:
                continue
            seen.add((x, y))
            d = bin(int(hashes[x], 16) ^ int(hashes[y], 16)).count("1")
            if d <= max_hamming:
                rows.append((x, y, d))
    rows.sort()
    return pa.table(
        {
            "doc_a": pa.array([r[0] for r in rows], type=pa.int64()),
            "doc_b": pa.array([r[1] for r in rows], type=pa.int64()),
            "hamming": pa.array([r[2] for r in rows], type=pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# exact n-gram Jaccard over all co-shingling pairs
# ---------------------------------------------------------------------------


def ngram_jaccard_pairs(
    docs: ray.data.Dataset,
    threshold: float,
    cfg: EngineConfig | None = None,
) -> pa.Table:
    """Exact Jaccard for every pair sharing >= 1 shingle (no LSH recall
    loss) via the distributed pair-counting core. At scale this is the
    expensive exact baseline; minhash_lsh_dedup is the scale path."""
    cfg = cfg or DEFAULT
    sh = docs.map_batches(
        lambda t: shingle_rows_batch(t, cfg.shingle_k), batch_format="pyarrow"
    )
    return pair_jaccard(sh, threshold)
