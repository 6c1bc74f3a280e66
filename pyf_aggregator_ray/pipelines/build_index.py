"""Full index build: corpus -> tokenize -> salted groupby(term) -> segments.

Lifecycle mirror of the reference flagship ``pyfa pypi -f``
(``/root/reference/src/pyf/aggregator/main.py:309-405``):

  reference                                  this engine
  ------------------------------------       ----------------------------------
  discovery + per-package fetch (S1/S2)      ray.data.read_parquet (pruned)
  plugin transform chain (ST1)               TokenizeStage actor pool
  clean_data + batched upsert (M2/K1)        encode/merge stages + write_parquet
  versioned collection + alias (K6)          v{N} dir + atomic ALIAS swap
  run statistics (A4)                        per-stage metrics in manifest.json

Default (segment strategy): ONE corpus pass — corpus -> tokens (the
tokenize stage side-writes per-batch doc-meta parquet: doc_id, repo,
path, commit, lang, dl, sha256) -> salt -> encode partitions -> merge
shards (small shuffle of compressed rows) -> sort(term) -> postings/
parquet; N + avgdl aggregated from the written docs/ artifact.
Resumable and term_shuffle strategies run a separate doc-meta pass
first (two corpus reads).

Resumable mode (``resumable=True``) splits the corpus into doc-id-range
partitions, builds per-partition partial postings under ``partials/``
(skipping partitions already marked done — the per-partition checkpoint
with lineage required by the north rule), then merges all partials with
the same merge stage. Partial shards use globally-defined doc-id range
salts, so shards from different partitions are disjoint and the ordered
concat merge stays correct.
"""

from __future__ import annotations

import os
import shutil
import time

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data
from ray.data.aggregate import Count, Max, Sum

from ..config import DEFAULT, EngineConfig
from ..sources.corpus import read_corpus
from ..stages.postings import (
    add_salt_and_part,
    encode_partition,
    merge_partition,
)
from ..stages.tokenize import TokenizeAndMetaStage, TokenizeStage, doc_meta_batch
from ..state import manifest as mf


def _stats_excerpt(ds: ray.data.Dataset, max_lines: int = 60) -> list[str]:
    """Per-operator wall/UDF/rows lines from the executed pipeline's
    ds.stats() — recorded in the manifest as per-stage lineage metrics."""
    try:
        lines = [
            ln.strip()
            for ln in ds.stats().splitlines()
            if any(
                key in ln
                for key in (
                    "Operator", "Remote wall time", "UDF time",
                    "Output num rows per block", "throughput",
                )
            )
        ]
        return lines[:max_lines]
    except Exception:  # stats are best-effort lineage, never fail a build
        return []


def _tokens_ds(
    corpus: ray.data.Dataset,
    cfg: EngineConfig,
    docs_dir: str | None = None,
) -> ray.data.Dataset:
    concurrency = cfg.tokenize_concurrency
    if concurrency is None:
        # autoscaling actor pool sized to the cluster, capped BELOW the
        # CPU count: a pool that can reserve every CPU starves the read /
        # encode stages and the pipeline serializes (visible as a
        # disproportionately slow low-CPU run in bench --scaling)
        cpus = int(ray.cluster_resources().get("CPU", 8))
        concurrency = (2, max(2, cpus - 2))
    if docs_dir is not None:
        # single-pass build: the tokenize stage side-writes per-batch
        # doc-meta parquet — one corpus read instead of two
        cls, args = TokenizeAndMetaStage, (cfg, docs_dir)
    else:
        cls, args = TokenizeStage, (cfg,)
    return corpus.map_batches(
        cls,
        fn_constructor_args=args,
        batch_format="pyarrow",
        batch_size=cfg.tokenize_batch_size,
        concurrency=concurrency,
    )


def estimate_hot_terms(
    corpus: ray.data.Dataset,
    cfg: EngineConfig,
    total_docs: int,
    sample_docs: int = 20_000,
) -> frozenset[str]:
    """Estimate globally-hot terms (df > hot_df_threshold) from a bounded
    sample. Used only for salting decisions — a miss costs skew, never
    correctness. Hot terms ('import', 'def', 'self') appear in nearly
    every code file, so a 20k-doc sample finds them w.h.p."""
    n = min(total_docs, sample_docs)
    if n == 0:
        return frozenset()
    toks = _tokens_ds(corpus.limit(n), cfg)
    # partial df per batch, then one tiny groupby — partial+final pattern
    partial = toks.map_batches(
        lambda t: t.group_by("term", use_threads=False)
        .aggregate([("doc_id", "count")])
        .rename_columns(["term", "df_part"]),
        batch_format="pyarrow",
    )
    stats = partial.groupby("term").aggregate(Sum("df_part", alias_name="df"))
    scaled_threshold = max(2, int(cfg.hot_df_threshold * (n / max(1, total_docs))))
    tbl = stats.to_pandas()  # sample vocabulary — small
    return frozenset(tbl.loc[tbl["df"] > scaled_threshold, "term"].tolist())


def _merge_stage(
    shards: ray.data.Dataset, merge_parts: int
) -> ray.data.Dataset:
    """Group shard rows by term-hash bucket and merge each bucket — the
    'streaming aggregate' over compressed shard rows."""

    def key_batch(t: pa.Table) -> pa.Table:
        h = pd.util.hash_array(
            t["term"].to_numpy(zero_copy_only=False).astype(object)
        )
        return t.append_column(
            "merge_part", pa.array((h % np.uint64(merge_parts)).astype(np.int64))
        )

    keyed = shards.map_batches(key_batch, batch_format="pyarrow")
    return keyed.groupby("merge_part").map_groups(
        lambda g: merge_partition(g.drop_columns(["merge_part"])),
        batch_format="pyarrow",
    )


def build_index(
    sf_dir: str,
    index_root: str,
    cfg: EngineConfig | None = None,
    *,
    corpus: ray.data.Dataset | None = None,
    num_parts: int | None = None,
    resumable: bool = False,
    num_partitions: int = 8,
    switch: bool = True,
    strategy: str = "segment",
) -> dict:
    """Build a new index version from ``{sf_dir}/documents.parquet`` (or an
    explicit corpus Dataset). Returns the manifest dict (incl. metrics).

    ``strategy='segment'`` (default): per-block encode + compressed-shard
    merge — no raw-token shuffle. ``strategy='term_shuffle'``: explicit
    salted groupby(term) over token rows. Both produce identical postings
    (tested); segment is ~an order of magnitude cheaper in bytes moved.
    """
    cfg = cfg or DEFAULT
    t0 = time.perf_counter()
    version = None
    if resumable:
        # reuse an interrupted resumable build's vdir so its per-partition
        # _SUCCESS checkpoints are consulted (a fresh v{N+1} would rebuild
        # everything and orphan the checkpoints) — but ONLY if the
        # partitioning config matches; stale checkpoints from a different
        # num_partitions/salting layout would corrupt the merge
        cand = mf.find_unfinished_version(index_root)
        if cand is not None:
            meta = mf.read_partials_meta(mf.version_dir(index_root, cand))
            if meta == _partials_meta(cfg, num_partitions):
                version = cand
    if version is None:
        version = mf.next_version(index_root)
    vdir = mf.version_dir(index_root, version)
    os.makedirs(vdir, exist_ok=True)
    if resumable:
        # only partials/ carries checkpoints; docs/ and postings/ from an
        # interrupted attempt are rebuilt (never appended into)
        for sub in ("docs", "postings"):
            p = os.path.join(vdir, sub)
            if os.path.isdir(p):
                shutil.rmtree(p)
    metrics: dict = {}

    # Token blocks fan out ~10-30x from content bytes; cap block size so
    # the encode stage gets many bounded tasks instead of a few huge
    # sorts (and per-task peak memory stays modest).
    ray.data.DataContext.get_current().target_max_block_size = 32 * 1024 * 1024

    def corpus_ds() -> ray.data.Dataset:
        return corpus if corpus is not None else read_corpus(sf_dir)

    def _ensure_parquet_dir(path: str, schema: pa.Schema) -> None:
        """write_parquet of a zero-row Dataset writes no files; give the
        artifact dir an explicit empty file so reads stay well-formed
        (an empty corpus builds an empty-but-valid index)."""
        if not os.path.isdir(path) or not any(
            f.endswith(".parquet") for f in os.listdir(path)
        ):
            import pyarrow.parquet as pq

            os.makedirs(path, exist_ok=True)
            pq.write_table(
                schema.empty_table(), os.path.join(path, "part-empty.parquet")
            )

    from ..stages.tokenize import DOCS_SCHEMA

    def _docs_stats() -> tuple[int, float]:
        docs_meta = ray.data.read_parquet(
            os.path.join(vdir, "docs"), columns=["dl"]
        )
        agg = docs_meta.aggregate(
            Count(alias_name="n"), Sum("dl", alias_name="sum_dl")
        )
        n = int(agg["n"])
        return n, (int(agg["sum_dl"] or 0) / n) if n else 0.0

    single_pass = not resumable and strategy == "segment"
    if single_pass:
        # doc metadata (incl. per-row sha256 invariant) is side-written
        # by the tokenize stage during the ONE corpus pass below — the
        # second full corpus read+tokenize of the two-pass layout is the
        # single largest avoidable cost at the 10^12-file design point.
        # The docs dir must START EMPTY (TokenizeAndMetaStage's contract):
        # stale meta files from an abandoned attempt with different batch
        # boundaries would silently duplicate doc rows.
        docs_dir = os.path.join(vdir, "docs")
        if os.path.isdir(docs_dir):
            import shutil

            shutil.rmtree(docs_dir)
        os.makedirs(docs_dir)
        metrics["docs_pass_sec"] = 0.0
        n_docs, avgdl = 0, 0.0  # computed from the written docs below
    else:
        # ---- pass 1: doc metadata ----
        t = time.perf_counter()
        docs_pipeline = corpus_ds().map_batches(
            doc_meta_batch, batch_format="pyarrow"
        )
        docs_pipeline.write_parquet(os.path.join(vdir, "docs"))
        _ensure_parquet_dir(os.path.join(vdir, "docs"), DOCS_SCHEMA)
        metrics["docs_pass_sec"] = time.perf_counter() - t
        metrics["docs_pass_stats"] = _stats_excerpt(docs_pipeline)
        n_docs, avgdl = _docs_stats()

    # ---- pass 2: tokens -> salted encode -> merge -> postings ----
    if num_parts is None:
        num_parts = max(8, int(ray.cluster_resources().get("CPU", 8)))
    t = time.perf_counter()

    if resumable:
        _build_partials(sf_dir, vdir, cfg, corpus, num_partitions)
        shards = ray.data.read_parquet(os.path.join(vdir, "partials"))
    elif strategy == "segment":
        # Default scale path: per-block segment encode, NO token shuffle.
        # Every term is range-salted (salt = doc_id // salt_range_docs),
        # so skew is bounded universally — a hot term ('import', 'def')
        # becomes many bounded shards merged by the streaming aggregate.
        # Blocks partition contiguous doc-id intervals, so shards from
        # different blocks are interval-disjoint and the ordered-concat
        # merge is exact (merge_partition verifies and raises otherwise).
        # The all-to-all now moves COMPRESSED shard rows, not raw tokens —
        # the same partial+final shape as the reference's batched imports
        # (indexer.py:49-62) and of segment-based distributed indexing.
        tokens = _tokens_ds(corpus_ds(), cfg, docs_dir=os.path.join(vdir, "docs"))

        def salt_batch(t_: pa.Table) -> pa.Table:
            salt = (
                t_["doc_id"].to_numpy(zero_copy_only=False)
                // cfg.salt_range_docs
            ).astype(np.int64)
            return t_.append_column("salt", pa.array(salt))

        shards = tokens.map_batches(salt_batch, batch_format="pyarrow").map_batches(
            encode_partition, batch_format="pyarrow", batch_size=None
        )
    else:  # strategy == "term_shuffle": explicit groupby(term) exchange
        t_hot = time.perf_counter()
        hot = estimate_hot_terms(corpus_ds(), cfg, n_docs)
        metrics["hot_estimate_sec"] = time.perf_counter() - t_hot
        metrics["hot_terms_sample"] = sorted(hot)[:50]
        metrics["num_hot_terms"] = len(hot)
        tokens = _tokens_ds(corpus_ds(), cfg)
        # broadcast the hot set once (ray.put), read per worker — the
        # broadcast-small-side pattern, not re-shipped per batch
        hot_ref = ray.put(hot)

        def salt_part_batch(t_: pa.Table) -> pa.Table:
            return add_salt_and_part(
                t_, ray.get(hot_ref), cfg.salt_range_docs, num_parts
            )

        salted = tokens.map_batches(salt_part_batch, batch_format="pyarrow")
        shards = salted.groupby("part").map_groups(
            lambda g: encode_partition(g.drop_columns(["part"])),
            batch_format="pyarrow",
        )

    final = _merge_stage(shards, merge_parts=max(4, num_parts // 4)).sort("term")
    try:
        final.write_parquet(
            os.path.join(vdir, "postings"),
            min_rows_per_file=cfg.postings_rows_per_file,
        )
    except TypeError:  # older Ray: num_rows_per_file
        final.write_parquet(
            os.path.join(vdir, "postings"),
            num_rows_per_file=cfg.postings_rows_per_file,
        )
    from ..stages.postings import merged_schema

    _ensure_parquet_dir(os.path.join(vdir, "postings"), merged_schema())
    metrics["index_pass_sec"] = time.perf_counter() - t
    metrics["index_pass_stats"] = _stats_excerpt(final)
    if single_pass:
        # the side-written doc-meta files exist now (the postings write
        # executed the pipeline); finalize the artifact + corpus stats
        _ensure_parquet_dir(os.path.join(vdir, "docs"), DOCS_SCHEMA)
        n_docs, avgdl = _docs_stats()

    # ---- stats + verification + manifest + atomic alias cutover ----
    pread = ray.data.read_parquet(
        os.path.join(vdir, "postings"), columns=["df", "cf"]
    ).map_batches(
        lambda t_: t_.append_column(
            "is_hot",
            pc.cast(pc.greater(t_["df"], cfg.hot_df_threshold), pa.int64()),
        ),
        batch_format="pyarrow",
    )
    pagg = pread.aggregate(
        Count(alias_name="vocab"),
        Sum("df", alias_name="total_postings"),
        Sum("cf", alias_name="total_tokens"),
        Sum("is_hot", alias_name="num_hot"),
    )
    # exact hot-term count from the final dictionary, one scan with stats
    metrics.setdefault("num_hot_terms", int(pagg["num_hot"] or 0))
    stats = {
        "num_docs": n_docs,
        "avgdl": avgdl,
        "vocab_size": int(pagg["vocab"] or 0),
        "total_postings": int(pagg["total_postings"] or 0),
        "total_tokens": int(pagg["total_tokens"] or 0),
        "k1": cfg.k1,
        "b": cfg.b,
    }
    mf.write_stats(vdir, stats)

    elapsed = time.perf_counter() - t0
    metrics["total_sec"] = elapsed
    metrics["docs_per_sec"] = n_docs / elapsed if elapsed else 0.0
    metrics["postings_per_sec"] = (
        stats["total_postings"] / metrics["index_pass_sec"]
        if metrics["index_pass_sec"]
        else 0.0
    )
    metrics["index_bytes"] = sum(
        os.path.getsize(os.path.join(dp, f))
        for dp, _, fs in os.walk(vdir)
        for f in fs
    )
    # the term shuffle moves every token row (term + 3 int64s + salt/part);
    # exact per-operator byte counts are in ds.stats(), surfaced by bench.py
    metrics["approx_shuffled_bytes"] = int(stats["total_postings"] * 40)

    manifest = {
        "version": version,
        # the streaming merge emits exactly one posting row per term
        # (merge_partition's invariant), so a full build resets the
        # append-compaction signal
        "max_term_shards": 1,
        "sf_dir": sf_dir,
        "input_files": (
            [os.path.join(sf_dir, "documents.parquet")] if sf_dir else []
        ),
        "config": {
            "k1": cfg.k1,
            "b": cfg.b,
            "hot_df_threshold": cfg.hot_df_threshold,
            "salt_range_docs": cfg.salt_range_docs,
            "num_parts": num_parts,
            "resumable": resumable,
        },
        "stats": stats,
        "metrics": metrics,
    }
    mf.write_manifest(vdir, manifest)

    # count verification before cutover (reference typesense_util.py:219-238)
    docs_count = ray.data.read_parquet(
        os.path.join(vdir, "docs"), columns=["doc_id"]
    ).count()
    if docs_count != n_docs:
        raise RuntimeError(
            f"verification failed: docs parquet has {docs_count} rows, expected {n_docs}"
        )
    if switch:
        mf.switch_alias(index_root, version)
    return manifest


def _partials_meta(cfg: EngineConfig, num_partitions: int) -> dict:
    """Checkpoint-compatibility fingerprint: a resumable rerun may only
    reuse partials built with the same partitioning + salting layout."""
    return {
        "num_partitions": int(num_partitions),
        "salt_range_docs": int(cfg.salt_range_docs),
        "token_pattern": cfg.token_pattern,
    }


def _build_partials(
    sf_dir: str,
    vdir: str,
    cfg: EngineConfig,
    corpus: ray.data.Dataset | None,
    num_partitions: int,
) -> None:
    """Per-doc-partition partial postings with checkpoint markers.

    Partition p owns doc ids in [p*W, (p+1)*W); its partial postings are a
    self-contained parquet dir. A rerun skips partitions whose _SUCCESS
    marker exists — the resume path. Shard salts are globally-defined
    doc-id ranges (doc_id // salt_range_docs), so shards from different
    partitions never overlap and the final ordered-concat merge is exact.
    """

    def corpus_ds() -> ray.data.Dataset:
        return corpus if corpus is not None else read_corpus(sf_dir)

    mf.write_partials_meta(vdir, _partials_meta(cfg, num_partitions))
    max_id = int(corpus_ds().aggregate(Max("doc_id"))["max(doc_id)"])
    width = max_id // num_partitions + 1

    def salt_partial(t: pa.Table) -> pa.Table:
        salt = (
            t["doc_id"].to_numpy(zero_copy_only=False) // cfg.salt_range_docs
        ).astype(np.int64)
        return t.append_column("salt", pa.array(salt))

    for pid in range(num_partitions):
        if mf.partition_done(vdir, pid):
            continue
        lo, hi = pid * width, (pid + 1) * width
        part_corpus = corpus_ds().map_batches(
            lambda t, lo=lo, hi=hi: t.filter(
                pc.and_(pc.greater_equal(t["doc_id"], lo), pc.less(t["doc_id"], hi))
            ),
            batch_format="pyarrow",
        )
        encoded = (
            _tokens_ds(part_corpus, cfg)
            .map_batches(salt_partial, batch_format="pyarrow")
            .groupby("salt")
            .map_groups(encode_partition, batch_format="pyarrow")
        )
        out_dir = os.path.join(vdir, "partials", f"part_{pid:05d}")
        # a crashed attempt may have left files without the _SUCCESS
        # marker — clear them so the rewrite can't duplicate rows
        if os.path.isdir(out_dir):
            shutil.rmtree(out_dir)
        encoded.write_parquet(out_dir)
        mf.mark_partition_done(
            vdir, pid, {"pid": pid, "doc_range": [lo, hi], "built_at": time.time()}
        )
