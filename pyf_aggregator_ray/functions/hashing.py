"""Hashing kernels: content sha256 (per-row invariant), doc ids, fingerprints.

The north rule requires per-row ``sha256(content)`` equality against the
source table to survive the pipeline; the reference's analogous identity
discipline is the deterministic document id ``"{package}-{version}"``
(``/root/reference/src/pyf/aggregator/fetcher.py:124``) that makes every
write idempotent.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa


def sha256_column(content: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Hex sha256 of each string value (empty string for nulls)."""
    if isinstance(content, pa.ChunkedArray):
        content = content.combine_chunks()
    # hashlib has no Arrow kernel; this is the one per-row C-call loop we
    # accept — sha256 itself dominates, not interpreter overhead.
    vals = content.to_pylist()
    return pa.array(
        [hashlib.sha256((v or "").encode("utf-8")).hexdigest() for v in vals],
        type=pa.string(),
    )


def commit_hex(repo: pa.Array | list, path: pa.Array | list) -> pa.Array:
    """Deterministic 40-hex 'commit' for synthesized corpus rows.

    Defined as ``md5(repo || '/' || path) || first 8 hex of that md5`` so
    the DuckDB oracle can reproduce it:
    ``md5(repo || '/' || path) || substr(md5(repo || '/' || path), 1, 8)``.
    """
    out = []
    for r, p in zip(
        repo.to_pylist() if isinstance(repo, (pa.Array, pa.ChunkedArray)) else repo,
        path.to_pylist() if isinstance(path, (pa.Array, pa.ChunkedArray)) else path,
    ):
        h = hashlib.md5(f"{r}/{p}".encode("utf-8")).hexdigest()
        out.append(h + h[:8])
    return pa.array(out, type=pa.string())


def rolling_fingerprint(tokens_list: list[list[str]], window: int = 4) -> np.ndarray:
    """Winnowing-style document fingerprint: min rolling hash over k-gram windows.

    Polynomial rolling hash of token k-grams, then the minimum across the
    document — a compact content fingerprint for fast prefiltering.
    Deterministic (no randomness, stable across runs/parallelism).
    """
    out = np.zeros(len(tokens_list), dtype=np.uint64)
    B = np.uint64(1_000_003)
    M = np.uint64(0xFFFFFFFFFFFF)  # 48-bit
    for i, toks in enumerate(tokens_list):
        if not toks:
            out[i] = 0
            continue
        th = np.array(
            [int(hashlib.md5(t.encode()).hexdigest()[:12], 16) for t in toks],
            dtype=np.uint64,
        )
        if len(th) < window:
            acc = np.uint64(0)
            for v in th:
                acc = (acc * B + v) & M
            out[i] = acc if acc else np.uint64(1)
            continue
        # vectorized k-gram hashes: h_j = sum th[j+i] * B^(k-1-i)
        powers = np.array(
            [pow(int(B), window - 1 - j, int(M) + 1) for j in range(window)],
            dtype=np.uint64,
        )
        n = len(th) - window + 1
        acc = np.zeros(n, dtype=np.uint64)
        for j in range(window):
            acc = (acc + th[j : j + n] * powers[j]) & M
        out[i] = acc.min() if acc.min() else np.uint64(1)
    return out
