"""Incremental index updates: watermark + dedup + delta merge.

Mirror of the reference's incremental path (RSS feed -> Redis ``SET NX``
dedup -> per-entry upsert, ``/root/reference/src/pyf/aggregator/
queue.py:590-724,539-587``; sincefile watermark ``fetcher.py:106-118``;
stale-id reconciliation ``npm_main.py:336-348``) as a batch job:

1. read the live index version (ALIAS)
2. anti-join incoming corpus rows against already-indexed doc ids:
   a distributed semi-join (tag-union + grouped aggregate, hash-
   partitioned on doc_id) finds the overlap, which is bounded by the
   DELTA size and broadcast by object ref to filter the delta rows —
   the full index id set never leaves the cluster
3. tokenize + encode ONLY the delta docs into posting shards
4. merge: existing posting rows are themselves valid shards, so the
   delta merge is the same ordered-concat streaming aggregate used by
   the full build — groupby(term) over (old rows ∪ delta shards)
5. write v_{N+1}, verify counts, atomically switch ALIAS (old version
   stays live until cutover — the zero-downtime property, reference
   ``typesense_util.py:174-319``)

The resulting postings are byte-identical to a from-scratch full build
over the union corpus (asserted in tests/test_incremental.py), because
delta doc-id ranges are disjoint from indexed ones and delta-gap encoding
composes under ordered concatenation.
"""

from __future__ import annotations

import os
import re
import time

import numpy as np
import pyarrow as pa

import ray
import ray.data
from ray.data.aggregate import Count, Sum

from ..config import DEFAULT, EngineConfig
from ..stages import idsets
from ..stages.postings import encode_partition
from ..stages.tokenize import TokenizeStage, doc_meta_batch
from ..state import manifest as mf
from .build_index import _merge_stage, _tokens_ds

_FEED_LINK_RE = re.compile(r"/project/([^/]+)/?(?:([^/]+)/?)?$")


def _link_dir(src_dir: str, dst_dir: str) -> None:
    """Hardlink every file of ``src_dir`` into ``dst_dir`` (copy fallback
    across filesystems) — the O(1)-per-file carry-over used by
    append-mode increments."""
    import shutil as _sh

    os.makedirs(dst_dir, exist_ok=True)
    for name in os.listdir(src_dir):
        s, d = os.path.join(src_dir, name), os.path.join(dst_dir, name)
        if os.path.isdir(s):
            continue
        try:
            os.link(s, d)
        except OSError:
            _sh.copy2(s, d)


def parse_feed_entry(entry: dict, filter_name: str | None = None) -> dict | None:
    """S3: one RSS feed entry -> ``{package_id, release_id, timestamp,
    link, description}`` or None (reference ``fetcher.py:669-736``).

    The registry's feeds come in two shapes — new-package entries
    (``title="pkg added to PyPI"``, link ``/project/pkg/``) and release
    entries (``title="pkg 1.0.0"``, link ``/project/pkg/1.0.0/``). The
    link is primary (most reliable); the title is the fallback, with the
    "added to" patterns yielding no release id. Timestamp comes from
    ``published_parsed`` then ``updated_parsed`` (struct_time via
    ``time.mktime``, or a numeric epoch passed through). ``filter_name``
    drops entries whose package id doesn't contain it."""
    title = entry.get("title", "") or ""
    link = entry.get("link", "") or ""

    package_id = None
    release_id = None
    if link:
        m = _FEED_LINK_RE.search(link)
        if m:
            package_id = m.group(1)
            release_id = m.group(2) or None
    if not package_id and title:
        if " added to PyPI" in title:
            package_id = title.split(" added to PyPI")[0].strip()
        elif " added to" in title:
            package_id = title.split(" added to")[0].strip()
        else:
            parts = title.rsplit(" ", 1)
            if len(parts) == 2:
                package_id = parts[0].strip()
                release_id = parts[1].strip()
            else:
                package_id = title.strip()
    if not package_id:
        return None

    timestamp = None
    for key in ("published_parsed", "updated_parsed"):
        val = entry.get(key)
        if val:
            timestamp = val if isinstance(val, (int, float)) else time.mktime(val)
            break

    if filter_name and filter_name not in package_id:
        return None
    return {
        "package_id": package_id,
        "release_id": release_id,
        "timestamp": timestamp,
        "link": link,
        "description": entry.get("summary", ""),
    }


def incremental_update(
    index_root: str,
    delta_corpus: ray.data.Dataset,
    cfg: EngineConfig | None = None,
    num_parts: int | None = None,
    mode: str = "merge",
) -> dict:
    """Merge new corpus rows into the live index as version N+1.

    ``mode="merge"`` (default) re-merges every term's posting rows —
    byte-identical to a from-scratch build over the union corpus, but
    each increment rewrites the whole postings artifact (O(index)).

    ``mode="append"`` is the O(delta) segment path for frequent small
    increments at large index sizes: the old posting FILES carry over by
    hardlink (no data pass), and the delta's term-sorted shard rows land
    alongside as extra rows per term. ``IndexReader`` concatenates
    same-term rows (shard tolerance), the facets / sorted-retrieval /
    tombstone paths are row-independent already; the trade is that
    per-row dictionary stats (``index_term_stats``, prefix df listings)
    see split dfs until a merge-mode increment or ``recreate_index``
    compacts the segments. Scoring is unaffected: BM25 contributions are
    computed at read time from summed df and the version's stats."""
    if mode not in ("merge", "append"):
        # an unvalidated typo ('Append') would silently fall through to
        # merge mode and record the bogus string in the manifest
        raise ValueError(f"mode must be 'merge' or 'append', got {mode!r}")
    cfg = cfg or DEFAULT
    t0 = time.perf_counter()
    live = mf.read_alias(index_root)
    if not live:
        raise RuntimeError(f"no live index under {index_root}; run a full build first")

    # ---- append-mode compaction policy: each append adds shard rows per
    # term, and the reader pays a per-lookup concat+sort over them. The
    # manifest records the live version's max rows-per-term; once it
    # reaches the configured bound the append ESCALATES to a merge-mode
    # compaction, so shard-concat depth stays bounded no matter how many
    # appends run. ----
    requested_mode = mode
    compacted = False
    if mode == "append":
        live_manifest = mf.read_manifest(live) or {}
        live_shards = int(live_manifest.get("max_term_shards", 1))
        if live_shards >= cfg.append_max_term_shards:
            mode = "merge"
            compacted = True
    version = mf.next_version(index_root)
    vdir = mf.version_dir(index_root, version)
    os.makedirs(vdir, exist_ok=True)

    # ---- watermark/dedup: drop rows already indexed (idempotent rerun).
    # The overlap (delta ∩ indexed) is computed as a distributed semi-join
    # on id-only columns; only that overlap — bounded by the DELTA size,
    # not the index — is broadcast to filter the delta rows. ----
    delta_corpus = delta_corpus.materialize()  # reused: overlap + fresh
    delta_ids = delta_corpus.map_batches(
        lambda t: t.select(["doc_id"]) if t.num_rows else
        pa.schema([("doc_id", pa.int64())]).empty_table(),
        batch_format="pyarrow",
    )
    live_ids = ray.data.read_parquet(
        os.path.join(live, "docs"), columns=["doc_id"]
    )
    # the delta is the bounded side of an increment by definition:
    # broadcast its id array and SCAN the live ids (no 10^12-group
    # shuffle; one vectorized isin pass over the id column)
    delta_ids_ref = idsets.id_array_ref(delta_ids)
    overlap_ref = idsets.id_array_ref(
        idsets.overlap_with_broadcast(delta_ids_ref, live_ids)
    )
    fresh = idsets.filter_out_ids(delta_corpus, overlap_ref)
    # reference overflow detection (fetcher.py:425-471): a NON-EMPTY
    # window that dropped NOTHING against the watermark likely overflowed
    # — entries between the runs may have been missed; surface it in the
    # manifest (the overlap array is small — bounded by the delta)
    n_overlap = len(ray.get(overlap_ref))
    n_delta = delta_corpus.count()

    # ---- docs meta: old partitions + delta rows -> v_{N+1}/docs ----
    new_meta = fresh.map_batches(doc_meta_batch, batch_format="pyarrow")
    if mode == "append":
        # O(delta): old doc files carry over by hardlink; only the delta
        # meta is written; totals derive from the PARENT's exact stats
        # (total_tokens == sum(dl), both integers) + the delta aggregate
        new_meta = new_meta.materialize()
        _link_dir(os.path.join(live, "docs"), os.path.join(vdir, "docs"))
        new_meta.write_parquet(os.path.join(vdir, "docs"))
        dagg = new_meta.aggregate(
            Count(alias_name="n"), Sum("dl", alias_name="sum_dl")
        )
        old_stats = mf.read_stats(live)
        n_docs = int(old_stats["num_docs"]) + int(dagg["n"] or 0)
        sum_dl = int(old_stats["total_tokens"]) + int(dagg["sum_dl"] or 0)
        avgdl = (sum_dl / n_docs) if n_docs else 0.0
    else:
        old_docs = ray.data.read_parquet(os.path.join(live, "docs"))
        old_docs.union(new_meta).write_parquet(os.path.join(vdir, "docs"))
        docs_meta = ray.data.read_parquet(
            os.path.join(vdir, "docs"), columns=["dl"]
        )
        agg = docs_meta.aggregate(
            Count(alias_name="n"), Sum("dl", alias_name="sum_dl")
        )
        n_docs = int(agg["n"])
        avgdl = (int(agg["sum_dl"] or 0) / n_docs) if n_docs else 0.0

    # ---- delta shards: range salt keeps them disjoint and mergeable ----
    def salt_delta(t: pa.Table) -> pa.Table:
        salt = (
            t["doc_id"].to_numpy(zero_copy_only=False) // cfg.salt_range_docs
        ).astype(np.int64)
        return t.append_column("salt", pa.array(salt))

    delta_shards = (
        _tokens_ds(fresh, cfg)
        .map_batches(salt_delta, batch_format="pyarrow")
        .groupby("salt")
        .map_groups(encode_partition, batch_format="pyarrow")
        .drop_columns(["salt"])
    )

    if mode == "append":
        # O(delta): hardlink the old posting files into the new version,
        # then write only the delta's term-sorted shard rows alongside
        # (Ray writes uniquely-named files into the existing dir)
        dst = os.path.join(vdir, "postings")
        _link_dir(os.path.join(live, "postings"), dst)
        delta_shards.sort("term").write_parquet(dst)
    else:
        # existing posting rows are valid single shards; union + same merge
        old_postings = ray.data.read_parquet(os.path.join(live, "postings"))
        if num_parts is None:
            num_parts = max(4, int(ray.cluster_resources().get("CPU", 8)) // 2)
        merged = _merge_stage(
            old_postings.union(delta_shards), merge_parts=num_parts
        )
        merged.sort("term").write_parquet(
            os.path.join(vdir, "postings"),
            min_rows_per_file=cfg.postings_rows_per_file,
        )

    # ---- stats + manifest + verified atomic cutover ----
    # vocab counts DISTINCT terms (append mode keeps several rows per
    # term); df/cf sums are row-additive in both modes. The SAME grouped
    # pass also yields max rows-per-term — the compaction-policy signal.
    term_rows = (
        ray.data.read_parquet(os.path.join(vdir, "postings"), columns=["term"])
        .groupby("term")
        .aggregate(Count(alias_name="term_rows"))
        .materialize()
    )
    vocab = term_rows.count()
    from ray.data.aggregate import Max

    max_term_shards = int(
        term_rows.aggregate(Max("term_rows", alias_name="mx"))["mx"] or 1
    )
    pagg = ray.data.read_parquet(
        os.path.join(vdir, "postings"), columns=["df", "cf"]
    ).aggregate(
        Sum("df", alias_name="total_postings"),
        Sum("cf", alias_name="total_tokens"),
    )
    stats = {
        "num_docs": n_docs,
        "avgdl": avgdl,
        "vocab_size": int(vocab or 0),
        "total_postings": int(pagg["total_postings"] or 0),
        "total_tokens": int(pagg["total_tokens"] or 0),
        "k1": cfg.k1,
        "b": cfg.b,
    }
    mf.write_stats(vdir, stats)
    manifest = {
        "version": version,
        "parent_version": mf.read_manifest(live).get("version") if mf.read_manifest(live) else None,
        "kind": "incremental",
        "mode": mode,
        "requested_mode": requested_mode,
        "compacted": compacted,
        "max_term_shards": max_term_shards,
        "stats": stats,
        "metrics": {
            "total_sec": time.perf_counter() - t0,
            "overlap_docs": n_overlap,
        },
        # a non-empty delta with zero overlap means the incremental
        # window may have missed entries between runs — the reference's
        # overflow warning; a periodic full rebuild reconciles (S3/§2.10)
        "window_overflow_warning": n_delta > 0 and n_overlap == 0,
    }
    mf.write_manifest(vdir, manifest)

    docs_count = ray.data.read_parquet(
        os.path.join(vdir, "docs"), columns=["doc_id"]
    ).count()
    if docs_count != n_docs:
        raise RuntimeError(
            f"verification failed: {docs_count} docs vs expected {n_docs}"
        )
    mf.switch_alias(index_root, version)
    return manifest
