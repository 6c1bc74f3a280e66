"""Dedup stages: exact, MinHash-LSH, SimHash, n-gram Jaccard — checked
against brute-force oracles on a corpus with planted duplicates."""

import itertools
import re

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from pyf_aggregator_ray.config import EngineConfig
from pyf_aggregator_ray.stages import dedup


@pytest.fixture(scope="module")
def dup_docs():
    """Docs with exact dups, near dups (small edits), and unique rows."""
    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(30)]
    texts = []
    for i in range(40):
        texts.append(" ".join(rng.choice(vocab, size=25).tolist()))
    texts[10] = texts[3]  # exact dup
    texts[11] = texts[3]  # exact dup (group of 3)
    near = texts[5].split()
    near[2] = "edited"
    texts[12] = " ".join(near)  # near dup of 5
    texts.append("")  # empty
    texts.append("one two")  # too short for 3-shingles
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), type=pa.int64()),
            "text": pa.array(texts, type=pa.string()),
        }
    )
    return tbl


def brute_jaccard_pairs(tbl, k, threshold):
    token_re = re.compile("[a-z0-9]+")
    sets = {}
    for d, t in zip(tbl["doc_id"].to_pylist(), tbl["text"].to_pylist()):
        toks = token_re.findall(t.lower())
        shs = {
            " ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)
        }
        if shs:
            sets[d] = shs
    out = []
    for x, y in itertools.combinations(sorted(sets), 2):
        inter = len(sets[x] & sets[y])
        if not inter:
            continue
        j = inter / len(sets[x] | sets[y])
        if j >= threshold:
            out.append((x, y))
    return out


def test_exact_dedup(dup_docs):
    ds = ray.data.from_arrow(dup_docs)
    res = dedup.exact_dedup(ds).to_pandas().sort_values("doc_id")
    groups = {}
    for d, t in zip(dup_docs["doc_id"].to_pylist(), dup_docs["text"].to_pylist()):
        groups.setdefault(t, []).append(d)
    expected = sorted((min(v), len(v)) for v in groups.values())
    got = sorted(zip(res["doc_id"], res["group_size"]))
    assert got == expected
    assert dict(got)[3] == 3  # planted triple


def test_ngram_jaccard_exact(dup_docs):
    ds = ray.data.from_arrow(dup_docs)
    res = dedup.ngram_jaccard_pairs(ds, 0.5)
    got = list(zip(res["doc_a"].to_pylist(), res["doc_b"].to_pylist()))
    assert got == brute_jaccard_pairs(dup_docs, 3, 0.5)
    # planted pairs found with correct jaccard
    d = {
        (a, b): j
        for a, b, j in zip(
            res["doc_a"].to_pylist(),
            res["doc_b"].to_pylist(),
            res["jaccard"].to_pylist(),
        )
    }
    assert d[(3, 10)] == 1.0 and d[(3, 11)] == 1.0 and d[(10, 11)] == 1.0
    assert (5, 12) in d and 0.5 <= d[(5, 12)] < 1.0


def test_minhash_lsh_finds_planted_dups(dup_docs):
    ds = ray.data.from_arrow(dup_docs)
    res = dedup.minhash_lsh_dedup(ds)
    got = set(zip(res["doc_a"].to_pylist(), res["doc_b"].to_pylist()))
    # exact dups always collide in every band
    assert {(3, 10), (3, 11), (10, 11)} <= got
    # every reported pair is truly above threshold (verify step is exact)
    exact = set(brute_jaccard_pairs(dup_docs, 3, EngineConfig().jaccard_threshold))
    assert got <= exact


def test_minhash_deterministic(dup_docs):
    ds = ray.data.from_arrow(dup_docs)
    r1 = dedup.minhash_lsh_dedup(ds)
    r2 = dedup.minhash_lsh_dedup(ray.data.from_arrow(dup_docs))
    assert r1.equals(r2)


def test_dedup_scale_50k_no_driver_materialization(ray_session):
    """50k-doc corpus end-to-end through MinHash-LSH and SimHash: the
    pipelines complete with bounded driver state (per-doc sizes/hashes
    stay Datasets, candidates live in the object store) and find exactly
    the planted duplicate pairs."""
    rng = np.random.default_rng(11)
    vocab = np.array([f"w{i}" for i in range(2000)])
    n = 50_000
    n_dups = 200
    texts = [" ".join(rng.choice(vocab, size=12)) for _ in range(n)]
    for i in range(n_dups):  # plant exact dups: (i, n - n_dups + i)
        texts[n - n_dups + i] = texts[i]
    tbl = pa.table(
        {"doc_id": pa.array(range(n), type=pa.int64()),
         "text": pa.array(texts)}
    )
    ds = ray.data.from_arrow(tbl).repartition(16).materialize()

    mh = dedup.minhash_lsh_dedup(ds)
    got = set(zip(mh["doc_a"].to_pylist(), mh["doc_b"].to_pylist()))
    planted = {(i, n - n_dups + i) for i in range(n_dups)}
    assert planted <= got
    # random 12-token docs over a 2000-word vocab essentially never share
    # a 3-shingle, so nothing beyond the planted pairs clears 0.5 Jaccard
    assert got == planted

    sh = dedup.simhash_near_dup_pairs(ds, max_hamming=0)
    got_s = set(zip(sh["doc_a"].to_pylist(), sh["doc_b"].to_pylist()))
    assert planted <= got_s


def test_simhash_oracle(dup_docs):
    """Engine simhash values equal a direct per-doc recompute; near-dup
    pairs equal brute-force hamming filter restricted to bucket recall."""
    import hashlib

    res = dedup.simhash_batch(dup_docs)
    token_re = re.compile("[a-z0-9]+")
    for d, t, h in zip(
        dup_docs["doc_id"].to_pylist(),
        dup_docs["text"].to_pylist(),
        res["simhash"].to_pylist(),
    ):
        toks = token_re.findall(t.lower())
        if not toks:
            assert h == "0" * 16
            continue
        acc = [0] * 64
        from collections import Counter

        for tok, tf in Counter(toks).items():
            hv = int(hashlib.md5(tok.encode()).hexdigest()[:16], 16)
            for i in range(64):
                acc[i] += tf if (hv >> i) & 1 else -tf
        val = sum(1 << i for i in range(64) if acc[i] > 0)
        assert h == f"{val:016x}", d

    pairs = dedup.simhash_near_dup_pairs(ray.data.from_arrow(dup_docs), max_hamming=8)
    hashes = dict(zip(res["doc_id"].to_pylist(), res["simhash"].to_pylist()))
    got = set(zip(pairs["doc_a"].to_pylist(), pairs["doc_b"].to_pylist()))
    # exact dups (hamming 0) must always be found
    assert {(3, 10), (3, 11), (10, 11)} <= got
    # reported hamming distances are exact
    for a, b, hd in zip(
        pairs["doc_a"].to_pylist(),
        pairs["doc_b"].to_pylist(),
        pairs["hamming"].to_pylist(),
    ):
        assert bin(int(hashes[a], 16) ^ int(hashes[b], 16)).count("1") == hd
        assert hd <= 8
