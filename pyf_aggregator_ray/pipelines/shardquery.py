"""Doc-id-sharded BM25 query path — the 100 TB-scale query engine.

The exhaustive scorer (``pipelines/query.py``) is exact and fast at
bench scale but holds O(corpus) state per actor: a hot term's full
posting list decodes into one actor, the dense accumulator spans the
whole doc-id space, and the composable stage loads the entire doc-meta
table. This module is the scale shape SURVEY §2.7 (T6) promises —
"per-partition scoring with per-partition top-k heaps and a tiny
global merge":

* ``ensure_sharded_postings`` derives, once per index version, a
  doc-id-RANGE-partitioned copy of the postings under
  ``{vdir}/postings_sharded/w{W}/shard={S}/`` (hive layout — one
  directory per shard, term-sorted rows inside, so a shard-scoped
  reader's pushdown touches ONLY its own files). Each row is one
  (term, shard) slice with shard-local df and its own delta-gap
  varint streams; global df stays in the main dictionary.
* ``ShardReader`` scores queries over ONE shard: per-actor postings,
  dense accumulators and doc metadata are all O(shard), never
  O(corpus). BM25 statistics (N, avgdl, df) are GLOBAL, so per-doc
  scores are bit-identical to the exhaustive scorer (each doc lives in
  exactly one shard and its per-term contributions accumulate in the
  same sorted-term order).
* ``run_query_set_sharded`` fans (query x shard) out as a Ray Dataset,
  scores each shard's slice in ``groupby(shard).map_groups`` tasks
  (per-worker reader cache = actor-state reuse), then merges the tiny
  per-shard top-k sets with a global rank pass — k rows per query per
  shard ever cross the cluster.

Reference parity: this serves the same ranked retrieval as the
reference's search (``/root/reference/src/pyf/aggregator/db.py:377-426``)
— the sharding is pure execution strategy, invisible in results
(rank- and score-identity vs the exhaustive path is pytest-pinned and
the driver's bm25_topk/weighted_bm25 oracles run against it).
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile

import numpy as np
import pyarrow as pa
import pyarrow.dataset as pads

import ray
import ray.data

from ..config import DEFAULT, EngineConfig
from ..functions.rounding import round6
from ..functions.tokenizer import tokenize_query
from ..state import manifest as mf

SHARDED_DIRNAME = "postings_sharded"
# target docs per shard when the width isn't given explicitly: at 100 TB
# this is the unit of per-actor memory AND the resume/checkpoint unit,
# so it must stay bounded regardless of corpus size
DEFAULT_TARGET_SHARDS_CAP = 64
DEFAULT_DOCS_PER_SHARD = 200_000


def _max_doc_id(docs_dir: str) -> int:
    """Max doc_id from parquet row-group statistics only — no data read
    (metadata-footer scan; at the 10^12-file design point this is the
    catalog lookup)."""
    import pyarrow.parquet as pq

    mx = -1
    for name in os.listdir(docs_dir):
        if not name.endswith(".parquet"):
            continue
        f = pq.ParquetFile(os.path.join(docs_dir, name))
        idx = f.schema_arrow.names.index("doc_id") if "doc_id" in f.schema_arrow.names else -1
        if idx < 0:
            continue
        for rg in range(f.metadata.num_row_groups):
            col = f.metadata.row_group(rg).column(idx)
            if col.statistics is not None and col.statistics.has_min_max:
                mx = max(mx, int(col.statistics.max))
    return mx


def _postings_fingerprint(postings_dir: str) -> str:
    """Cheap change detector for the source postings (append-mode writes
    new files into the same dir — a stale derived artifact must rebuild,
    never silently serve old postings)."""
    names = sorted(
        f for f in os.listdir(postings_dir) if f.endswith(".parquet")
    )
    sizes = [os.path.getsize(os.path.join(postings_dir, f)) for f in names]
    import hashlib

    return hashlib.md5(json.dumps([names, sizes]).encode()).hexdigest()[:16]


def split_posting_batch(tbl: pa.Table, width: int) -> pa.Table:
    """Split merged posting rows at doc-shard boundaries, fully
    vectorized: ONE decode of the whole batch, one segmented delta-gap
    rewrite, one varint pass per stream. Rows of the same term arriving
    in several input rows (appended deltas) just produce several
    (term, shard) rows — the shard reader concatenates, same as the
    main reader's shard-tolerant path."""
    from ..stages.postings import (
        _binary_from_offsets,
        decode_posting_batch,
    )
    from ..functions.varint import encode_varint_with_lengths

    out_schema = pa.schema(
        [
            ("term", pa.string()),
            ("shard", pa.int64()),
            ("df", pa.int64()),
            ("cf", pa.int64()),
            ("first_doc", pa.int64()),
            ("last_doc", pa.int64()),
            ("gaps", pa.large_binary()),
            ("tfs", pa.large_binary()),
            ("dls", pa.large_binary()),
        ]
    )
    if tbl.num_rows == 0:
        return out_schema.empty_table()
    counts, ids, tfs, dls = decode_posting_batch(tbl)
    total = int(counts.sum())
    if total == 0:
        return out_schema.empty_table()
    row_of = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
    shard = ids // width
    change = np.ones(total, dtype=bool)
    change[1:] = (row_of[1:] != row_of[:-1]) | (shard[1:] != shard[:-1])
    starts = np.flatnonzero(change)
    ends = np.concatenate([starts[1:], [total]])

    gaps = ids.astype(np.uint64).copy()
    gaps[1:] -= ids[:-1].astype(np.uint64)
    gaps[starts] = ids[starts].astype(np.uint64)
    gaps_buf, gaps_nb = encode_varint_with_lengths(gaps)
    tfs_buf, tfs_nb = encode_varint_with_lengths(tfs.astype(np.uint64))
    dls_buf, dls_nb = encode_varint_with_lengths(dls.astype(np.uint64))

    def offsets_for(nb: np.ndarray) -> np.ndarray:
        cum = np.concatenate(([0], np.cumsum(nb)))
        return np.concatenate((cum[starts], [cum[-1]]))

    terms = tbl["term"].to_numpy(zero_copy_only=False)
    return pa.table(
        {
            "term": pa.array(terms[row_of[starts]], type=pa.string()),
            "shard": pa.array(shard[starts].astype(np.int64)),
            "df": pa.array((ends - starts).astype(np.int64)),
            "cf": pa.array(np.add.reduceat(tfs, starts).astype(np.int64)),
            "first_doc": pa.array(ids[starts]),
            "last_doc": pa.array(ids[ends - 1]),
            "gaps": _binary_from_offsets(gaps_buf, offsets_for(gaps_nb)),
            "tfs": _binary_from_offsets(tfs_buf, offsets_for(tfs_nb)),
            "dls": _binary_from_offsets(dls_buf, offsets_for(dls_nb)),
        }
    )


def ensure_sharded_postings(
    vdir: str,
    cfg: EngineConfig | None = None,
    shard_width: int | None = None,
) -> tuple[str, dict]:
    """Derive (once per index version x width) the doc-range-sharded
    postings layout; returns (artifact_dir, meta). Built on demand like
    the typo/positions/ANN artifacts; rebuilt automatically when the
    source postings changed (append-mode fingerprint)."""
    cfg = cfg or DEFAULT
    postings_dir = os.path.join(vdir, "postings")
    stats = mf.read_stats(vdir)
    if shard_width is None:
        n = max(1, int(stats.get("num_docs", 1)))
        target = min(
            DEFAULT_TARGET_SHARDS_CAP, max(1, -(-n // DEFAULT_DOCS_PER_SHARD))
        )
        max_id = _max_doc_id(os.path.join(vdir, "docs"))
        shard_width = max(1, -(-(max_id + 1) // target)) if max_id >= 0 else 1
    path = os.path.join(vdir, SHARDED_DIRNAME, f"w{shard_width}")
    meta_path = os.path.join(path, "_META.json")
    fp = _postings_fingerprint(postings_dir)
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
        if meta.get("source_fingerprint") == fp:
            return path, meta
        shutil.rmtree(path, ignore_errors=True)

    os.makedirs(os.path.dirname(path), exist_ok=True)
    # build into a sibling tmp dir, finalize with an atomic rename — a
    # concurrent reader never sees a half-written artifact
    tmp = tempfile.mkdtemp(prefix=f".w{shard_width}.", dir=os.path.dirname(path))
    ds = ray.data.read_parquet(postings_dir)
    ds.map_batches(
        lambda t, w=shard_width: split_posting_batch(t, w),
        batch_format="pyarrow",
    ).write_parquet(tmp, partition_cols=["shard"])
    shards = sorted(
        int(name.split("=", 1)[1])
        for name in os.listdir(tmp)
        if name.startswith("shard=")
    )
    meta = {
        "shard_width": int(shard_width),
        "shards": shards,
        "num_docs": int(stats.get("num_docs", 0)),
        "source_fingerprint": fp,
    }
    with open(os.path.join(tmp, "_META.json"), "w") as f:
        json.dump(meta, f)
    shutil.rmtree(path, ignore_errors=True)
    try:
        os.replace(tmp, path)
    except OSError:
        # lost a cross-process build race: another builder renamed its
        # finished artifact in first. Use theirs if it matches the same
        # source fingerprint; otherwise propagate.
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                other = json.load(f)
            if other.get("source_fingerprint") == fp:
                shutil.rmtree(tmp, ignore_errors=True)
                return path, other
        raise
    return path, meta


class ShardReader:
    """Scores queries over ONE doc-id shard with GLOBAL BM25 statistics.

    Per-actor memory is O(shard): posting slices, the dense accumulator
    (``np.zeros(shard_width)``) and any doc metadata are all bounded by
    the shard, not the corpus. Per-doc contributions and their
    accumulation order are identical to ``query.IndexReader`` — scores
    are bit-equal (pytest-pinned)."""

    def __init__(
        self,
        vdir: str,
        shard: int,
        shard_width: int,
        cfg: EngineConfig | None = None,
        artifact_dir: str | None = None,
    ):
        self.vdir = vdir
        self.shard = int(shard)
        self.width = int(shard_width)
        self.base = self.shard * self.width
        self.cfg = cfg or DEFAULT
        self.stats = mf.read_stats(vdir)
        art = artifact_dir or os.path.join(
            vdir, SHARDED_DIRNAME, f"w{shard_width}"
        )
        # the shard's OWN directory only — a shard-scoped reader never
        # opens another shard's files
        self._shard_ds = pads.dataset(os.path.join(art, f"shard={self.shard}"))
        self._dict = pads.dataset(os.path.join(vdir, "postings"))
        self._df_cache: dict[str, int] = {}
        # term -> (local doc_ids sorted, contributions)
        self._cache: dict[str, tuple[np.ndarray, np.ndarray]] = {}

    def _global_df(self, terms: list[str]) -> dict[str, int]:
        missing = [t for t in terms if t not in self._df_cache]
        if missing:
            # dictionary lookup: term+df columns only (no posting bytes
            # leave the row group), pushdown on term; multi-row terms
            # (appended deltas) sum
            tbl = self._dict.to_table(
                columns=["term", "df"],
                filter=pads.field("term").isin(missing),
            )
            for t_, d in zip(tbl["term"].to_pylist(), tbl["df"].to_pylist()):
                self._df_cache[t_] = self._df_cache.get(t_, 0) + int(d)
            for t_ in missing:
                self._df_cache.setdefault(t_, 0)
        return {t: self._df_cache[t] for t in terms}

    def _contribution(
        self, tfs: np.ndarray, dls: np.ndarray, df: int
    ) -> np.ndarray:
        cfg = self.cfg
        n = self.stats["num_docs"]
        avgdl = self.stats["avgdl"]
        idf = np.log(1.0 + (n - df + 0.5) / (df + 0.5))
        return idf * (
            tfs * (cfg.k1 + 1.0)
            / (tfs + cfg.k1 * (1.0 - cfg.b + cfg.b * dls / avgdl))
        )

    def lookup(self, terms: list[str]) -> dict[str, tuple[np.ndarray, np.ndarray]]:
        """term -> (doc_ids, contributions) for terms with postings in
        THIS shard. Contributions use global df/N/avgdl."""
        dfs = self._global_df(terms)
        missing = [t for t in terms if t not in self._cache and dfs[t] > 0]
        if missing:
            from ..stages.postings import decode_posting_batch

            tbl = self._shard_ds.to_table(
                columns=["term", "df", "gaps", "tfs", "dls"],
                filter=pads.field("term").isin(missing),
            )
            counts, ids_all, tfs_all, dls_all = decode_posting_batch(tbl)
            ends = np.cumsum(counts)
            starts = ends - counts
            by_term: dict[str, list[int]] = {}
            for i, term in enumerate(tbl["term"].to_pylist()):
                by_term.setdefault(term, []).append(i)
            for term, idxs in by_term.items():
                if len(idxs) == 1:
                    i = idxs[0]
                    s, e = starts[i], ends[i]
                    ids, tfs, dls = ids_all[s:e], tfs_all[s:e], dls_all[s:e]
                else:
                    ids = np.concatenate([ids_all[starts[i]:ends[i]] for i in idxs])
                    tfs = np.concatenate([tfs_all[starts[i]:ends[i]] for i in idxs])
                    dls = np.concatenate([dls_all[starts[i]:ends[i]] for i in idxs])
                    order = np.argsort(ids, kind="stable")
                    ids, tfs, dls = ids[order], tfs[order], dls[order]
                self._cache[term] = (
                    ids,
                    self._contribution(tfs, dls, dfs[term]),
                )
            for t in missing:
                self._cache.setdefault(
                    t, (np.empty(0, np.int64), np.empty(0, np.float64))
                )
        return {
            t: self._cache[t]
            for t in terms
            if t in self._cache and len(self._cache[t][0]) > 0
        }

    def accumulate(self, query: str) -> tuple[np.ndarray, np.ndarray]:
        """Every matching doc IN THIS SHARD with its full global BM25
        score. Mirrors ``IndexReader.accumulate`` exactly (sorted-term
        accumulation order; dense/sparse switch on the LOCAL id span —
        the dense array is at most ``shard_width`` floats)."""
        empty = (np.empty(0, np.int64), np.empty(0, np.float64))
        terms = tokenize_query(query)
        found = self.lookup(terms)
        if not found or self.stats["num_docs"] == 0:
            return empty
        parts = [found[t] for t in sorted(found)]
        total_postings = sum(len(p[0]) for p in parts)
        lo = min(int(p[0][0]) for p in parts)
        hi = max(int(p[0][-1]) for p in parts)
        span = hi - lo + 1
        if len(parts) == 1:
            uniq, scores = parts[0][0], parts[0][1]
        elif total_postings * 4 >= span:
            dense = np.zeros(span, dtype=np.float64)
            for ids, contrib in parts:
                dense[ids - lo] += contrib
            nz = np.flatnonzero(dense)
            uniq = nz + lo
            scores = dense[nz]
        else:
            ids_cat = np.concatenate([p[0] for p in parts])
            contrib_cat = np.concatenate([p[1] for p in parts])
            uniq, inv = np.unique(ids_cat, return_inverse=True)
            scores = np.zeros(len(uniq), dtype=np.float64)
            np.add.at(scores, inv, contrib_cat)
        return uniq, scores

    def topk(
        self,
        query: str,
        k: int,
        w_ids: np.ndarray | None = None,
        w_vals: np.ndarray | None = None,
    ) -> tuple[np.ndarray, np.ndarray]:
        """This shard's local top-k (score desc, doc_id asc) ->
        (doc_ids, scores). ``w_ids/w_vals`` are the sorted doc-weight
        arrays (zero-copy from the object store); only the slice
        overlapping this shard is ever touched."""
        uniq, scores = self.accumulate(query)
        if len(uniq) == 0:
            return uniq, scores
        if w_ids is not None and len(w_ids):
            pos = np.searchsorted(w_ids, uniq)
            okw = (pos < len(w_ids)) & (
                w_ids[np.minimum(pos, len(w_ids) - 1)] == uniq
            )
            w = np.ones(len(uniq), dtype=np.float64)
            w[okw] = w_vals[pos[okw]]
            scores = scores * w
        if k < len(uniq):
            kth = np.partition(scores, len(scores) - k)[len(scores) - k]
            cand = np.flatnonzero(scores >= kth)
            order = cand[np.lexsort((uniq[cand], -scores[cand]))][:k]
        else:
            order = np.lexsort((uniq, -scores))[:k]
        return uniq[order], scores[order]


# per-worker-process reader cache: map_groups tasks land on a pool of
# reused worker processes, so this is the actor-state pattern without
# pinning one actor per shard; bounded so a worker that has served many
# shards holds at most a few shards' postings
_READER_CACHE: dict[tuple, ShardReader] = {}
_READER_CACHE_CAP = 4


def _shard_reader(
    vdir: str, shard: int, width: int, cfg: EngineConfig | None
) -> ShardReader:
    key = (vdir, int(shard), int(width))
    r = _READER_CACHE.get(key)
    if r is None:
        if len(_READER_CACHE) >= _READER_CACHE_CAP:
            _READER_CACHE.pop(next(iter(_READER_CACHE)))
        r = _READER_CACHE[key] = ShardReader(vdir, shard, width, cfg)
    return r


def run_query_set_sharded(
    index_path: str,
    queries: list[tuple[int, str, int]] | None = None,
    cfg: EngineConfig | None = None,
    weights_ref: "ray.ObjectRef | None" = None,
    shard_width: int | None = None,
) -> ray.data.Dataset:
    """Distributed sharded scoring: (query x shard) fan-out ->
    per-shard local top-k -> global rank merge. Same output schema as
    ``query.run_query_set`` (query_id, rank, doc_id, score); rank- and
    score-identical results."""
    from .query import QUERY_SET

    queries = queries or QUERY_SET
    live = mf.read_alias(index_path)
    vdir = live if live else index_path
    _, meta = ensure_sharded_postings(vdir, cfg, shard_width)
    shards = meta["shards"]
    width = meta["shard_width"]

    qids, texts, ks, srow = [], [], [], []
    for qid, text, k in queries:
        for s in shards:
            qids.append(qid)
            texts.append(text)
            ks.append(k)
            srow.append(s)
    qds = ray.data.from_arrow(
        pa.table(
            {
                "query_id": pa.array(qids, type=pa.int64()),
                "query": pa.array(texts, type=pa.string()),
                "k": pa.array(ks, type=pa.int64()),
                "shard": pa.array(srow, type=pa.int64()),
            }
        )
    )

    local_schema = pa.schema(
        [("query_id", pa.int64()), ("k", pa.int64()),
         ("doc_id", pa.int64()), ("score", pa.float64())]
    )

    def score_shard(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return local_schema.empty_table()
        shard = int(g["shard"][0].as_py())
        reader = _shard_reader(vdir, shard, width, cfg)
        w_ids = w_vals = None
        if weights_ref is not None:
            w_ids, w_vals = ray.get(weights_ref)
        out_q, out_k, out_d, out_s = [], [], [], []
        for qid, text, k in zip(
            g["query_id"].to_pylist(), g["query"].to_pylist(), g["k"].to_pylist()
        ):
            ids, scores = reader.topk(text, int(k), w_ids, w_vals)
            out_q.append(np.full(len(ids), qid, dtype=np.int64))
            out_k.append(np.full(len(ids), k, dtype=np.int64))
            out_d.append(ids.astype(np.int64))
            out_s.append(scores)
        if not out_q:
            return local_schema.empty_table()
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q)),
                "k": pa.array(np.concatenate(out_k)),
                "doc_id": pa.array(np.concatenate(out_d)),
                "score": pa.array(np.concatenate(out_s) if out_s else []),
            },
            schema=local_schema,
        )

    local = qds.groupby("shard").map_groups(score_shard, batch_format="pyarrow")

    out_schema = pa.schema(
        [("query_id", pa.int64()), ("rank", pa.int64()),
         ("doc_id", pa.int64()), ("score", pa.float64())]
    )

    def global_topk(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return out_schema.empty_table()
        k = int(g["k"][0].as_py())
        ids = g["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        scores = g["score"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, -scores))[:k]
        qid = int(g["query_id"][0].as_py())
        return pa.table(
            {
                "query_id": pa.array(np.full(len(order), qid, dtype=np.int64)),
                "rank": pa.array(np.arange(1, len(order) + 1, dtype=np.int64)),
                "doc_id": pa.array(ids[order]),
                "score": pa.array(round6(scores[order])),
            },
            schema=out_schema,
        )

    return local.groupby("query_id").map_groups(
        global_topk, batch_format="pyarrow"
    )


@ray.remote
def weight_arrays_task(*tables) -> tuple[np.ndarray, np.ndarray]:
    """(doc_id, weight) tables -> sorted parallel numpy arrays. Built
    inside a Ray task and shared via ONE object-store entry; numpy
    arrays come back zero-copy from plasma, so N scorer workers share
    one resident copy instead of N dict replicas (the O(corpus)
    per-actor weight map was the round-4 scale finding)."""
    ids = np.concatenate(
        [t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64) for t in tables]
    ) if tables else np.empty(0, np.int64)
    vals = np.concatenate(
        [t["weight"].to_numpy(zero_copy_only=False).astype(np.float64) for t in tables]
    ) if tables else np.empty(0, np.float64)
    order = np.argsort(ids)
    return ids[order], vals[order]


# ---------------------------------------------------------------------------
# sharded COMPOSABLE search: the full parameter surface (filter_by +
# group_by + num_typos + sort_by + negation + pagination) with O(shard)
# per-task state. The in-process ComposableScorerStage loads the WHOLE
# doc-meta table per actor (searchplus.py — the round-4 verdict's last
# scale finding); here each shard task reads only its doc-id range of
# docs/ (parquet range pushdown) and its own postings slice.
#
# Exactness of the distributed merge:
# * ungrouped: the comparator (sort_key desc, doc_id asc) is a TOTAL
#   order, so per-shard top-(page*k) sets cover the global window.
# * grouped: a group's global representative value is the max over its
#   per-shard bests; per-shard reps are pruned TIE-INCLUSIVELY (keep
#   every rep whose value >= the m-th largest, m = page*k) so any group
#   that can reach the global window survives the cut; the merge then
#   re-picks best-per-group with the same (value desc, doc_id asc)
#   comparator the single-actor stage uses.
# ---------------------------------------------------------------------------


class ShardComposable:
    """Per-shard composable evaluation (one instance per (vdir, shard)
    in the worker-process cache)."""

    def __init__(self, vdir: str, shard: int, width: int,
                 cfg: EngineConfig | None = None):
        self.reader = ShardReader(vdir, shard, width, cfg)
        self.vdir = vdir
        self._docs = pads.dataset(os.path.join(vdir, "docs"))
        lo, hi = self.reader.base, self.reader.base + self.reader.width
        self._range_expr = (pads.field("doc_id") >= lo) & (
            pads.field("doc_id") < hi
        )
        tbl = self._docs.to_table(
            columns=["doc_id", "repo", "dl"], filter=self._range_expr
        )
        import pyarrow.compute as pc

        ids = tbl["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(ids)
        self._ids = ids[order]
        enc = pc.dictionary_encode(tbl["repo"].combine_chunks())
        self._codes = enc.indices.to_numpy(zero_copy_only=False).astype(
            np.int64
        )[order]
        self._names = enc.dictionary.to_pylist()
        self._dls = tbl["dl"].to_numpy(zero_copy_only=False).astype(np.int64)[order]
        self._allowed: dict[str, np.ndarray] = {}
        self._typo_terms: dict[tuple[str, int], str] = {}

    def _allowed_ids(self, filter_by: str) -> np.ndarray:
        """Filter evaluated over THIS SHARD's doc range only (range
        expression AND the equality clauses — one pushdown read)."""
        cached = self._allowed.get(filter_by)
        if cached is None:
            expr = self._range_expr
            for clause in filter_by.split(" && "):
                field, _, value = clause.partition(":=")
                expr = expr & (pads.field(field.strip()) == value.strip())
            tbl = self._docs.to_table(columns=["doc_id"], filter=expr)
            cached = self._allowed[filter_by] = np.sort(
                tbl["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            )
        return cached

    def _expand_typos(self, query: str, budget: int) -> str:
        """Same artifact-based expansion as the in-process stage
        (vocab-bounded, never corpus-bounded), cached per worker."""
        key = (query, budget)
        cached = self._typo_terms.get(key)
        if cached is None:
            from .registry import (
                TYPO_ARTIFACT_DIST,
                _deletes,
                _levenshtein,
                ensure_typo_artifact,
            )

            art = ensure_typo_artifact(self.vdir)
            assert budget <= TYPO_ARTIFACT_DIST
            toks = tokenize_query(query)
            keys = (
                sorted(set().union(*(_deletes(t, budget) for t in toks)))
                if toks else []
            )
            matched: set[str] = set()
            if keys:
                tbl = pads.dataset(art).to_table(
                    columns=["key", "term"],
                    filter=pads.field("key").isin(keys),
                )
                for term in set(tbl["term"].to_pylist()):
                    for tok in toks:
                        if abs(len(term) - len(tok)) <= budget and _levenshtein(
                            tok, term
                        ) <= budget:
                            matched.add(term)
                            break
            cached = self._typo_terms[key] = " ".join(sorted(matched))
        return cached

    def run_one_local(
        self, query: str, m: int, filter_by: str, group_by: bool,
        num_typos: int, sort_by: str,
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
        """This shard's candidate rows for one composed query ->
        (repo_names, doc_ids, scores, dls, sort_vals), pruned to the
        top-m boundary (tie-inclusive under group_by)."""
        from .searchplus import parse_negation

        empty = (
            np.empty(0, object), np.empty(0, np.int64),
            np.empty(0, np.float64), np.empty(0, np.int64),
            np.empty(0, np.float64),
        )
        query, neg = parse_negation(query)
        if num_typos > 0:
            query = self._expand_typos(query, num_typos)
            if not query:
                return empty
        uniq, sc = self.reader.accumulate(query)
        if len(uniq) == 0:
            return empty
        if filter_by:
            allowed = self._allowed_ids(filter_by)
            if len(allowed) == 0:
                return empty
            pos = np.searchsorted(allowed, uniq)
            ok = (pos < len(allowed)) & (
                allowed[np.minimum(pos, len(allowed) - 1)] == uniq
            )
            uniq, sc = uniq[ok], sc[ok]
        if neg and len(uniq):
            hits = self.reader.lookup(neg)
            if hits:
                excl = np.unique(
                    np.concatenate([ids for ids, _ in hits.values()])
                )
                pos = np.searchsorted(excl, uniq)
                hit = (pos < len(excl)) & (
                    excl[np.minimum(pos, len(excl) - 1)] == uniq
                )
                uniq, sc = uniq[~hit], sc[~hit]
        if len(uniq) == 0:
            return empty
        pos = np.searchsorted(self._ids, uniq)
        ok = (pos < len(self._ids)) & (
            self._ids[np.minimum(pos, len(self._ids) - 1)] == uniq
        )
        uniq, sc, pos = uniq[ok], sc[ok], pos[ok]
        if len(uniq) == 0:
            return empty
        gid = self._codes[pos]
        dls = self._dls[pos]
        sortv = dls.astype(np.float64) if sort_by == "dl" else sc
        if group_by:
            # this shard's best per group (value desc, doc_id asc) —
            # same comparator as the single-actor stage
            order = np.lexsort((uniq, -sortv, gid))
            g_sorted = gid[order]
            first = np.ones(len(order), dtype=bool)
            first[1:] = g_sorted[1:] != g_sorted[:-1]
            sel = order[first]
            # tie-inclusive prune: keep reps with value >= m-th largest
            if m < len(sel):
                v = sortv[sel]
                kth = np.partition(v, len(v) - m)[len(v) - m]
                sel = sel[v >= kth]
        else:
            sel = np.arange(len(uniq))
            if m < len(sel):
                # total order (value desc, doc_id asc): plain top-m
                sel = sel[np.lexsort((uniq, -sortv))][:m]
        names = np.array([self._names[g] for g in gid[sel]], dtype=object)
        return names, uniq[sel], sc[sel], dls[sel], sortv[sel]


_COMPOSABLE_CACHE: dict[tuple, "ShardComposable"] = {}


def _shard_composable(
    vdir: str, shard: int, width: int, cfg: EngineConfig | None
) -> "ShardComposable":
    key = (vdir, int(shard), int(width))
    r = _COMPOSABLE_CACHE.get(key)
    if r is None:
        if len(_COMPOSABLE_CACHE) >= _READER_CACHE_CAP:
            _COMPOSABLE_CACHE.pop(next(iter(_COMPOSABLE_CACHE)))
        r = _COMPOSABLE_CACHE[key] = ShardComposable(vdir, shard, width, cfg)
    return r


def run_composable_sharded(
    index_path: str,
    queries: "list[tuple[int, str, int, str | None, bool, int, str, int]]",
    cfg: EngineConfig | None = None,
    shard_width: int | None = None,
) -> ray.data.Dataset:
    """Distributed composable search over doc-id shards. Input tuples
    are (query_id, query, k, lang_filter|None, group_by, num_typos,
    sort_by, page) — the COMPOSABLE_QUERIES shape; output schema matches
    the in-process composable stage: (query_id, rank, repo, doc_id,
    score, dl), result-identical (pytest-pinned)."""
    from .searchplus import _filter_by_string

    live = mf.read_alias(index_path)
    vdir = live if live else index_path
    _, meta = ensure_sharded_postings(vdir, cfg, shard_width)
    shards = meta["shards"]
    width = meta["shard_width"]

    cols: dict[str, list] = {
        "query_id": [], "query": [], "k": [], "filter_by": [],
        "group_by": [], "num_typos": [], "sort_by": [], "page": [],
        "shard": [],
    }
    for qid, text, k, lang, grp, typos, sort_by, page in queries:
        for s in shards:
            cols["query_id"].append(qid)
            cols["query"].append(text)
            cols["k"].append(k)
            cols["filter_by"].append(_filter_by_string(lang, None))
            cols["group_by"].append(bool(grp))
            cols["num_typos"].append(typos)
            cols["sort_by"].append(sort_by)
            cols["page"].append(page)
            cols["shard"].append(s)
    qds = ray.data.from_arrow(
        pa.table(
            {
                "query_id": pa.array(cols["query_id"], pa.int64()),
                "query": pa.array(cols["query"], pa.string()),
                "k": pa.array(cols["k"], pa.int64()),
                "filter_by": pa.array(cols["filter_by"], pa.string()),
                "group_by": pa.array(cols["group_by"], pa.bool_()),
                "num_typos": pa.array(cols["num_typos"], pa.int64()),
                "sort_by": pa.array(cols["sort_by"], pa.string()),
                "page": pa.array(cols["page"], pa.int64()),
                "shard": pa.array(cols["shard"], pa.int64()),
            }
        )
    )

    local_schema = pa.schema(
        [("query_id", pa.int64()), ("k", pa.int64()), ("page", pa.int64()),
         ("group_by", pa.bool_()), ("sort_by", pa.string()),
         ("repo", pa.string()), ("doc_id", pa.int64()),
         ("score", pa.float64()), ("dl", pa.int64()),
         ("sortv", pa.float64())]
    )

    def score_shard(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return local_schema.empty_table()
        shard = int(g["shard"][0].as_py())
        stage = _shard_composable(vdir, shard, width, cfg)
        parts = []
        for row in g.to_pylist():
            m = max(1, int(row["page"])) * int(row["k"])
            names, ids, sc, dls, sortv = stage.run_one_local(
                row["query"], m, row["filter_by"], bool(row["group_by"]),
                int(row["num_typos"]), row["sort_by"],
            )
            n = len(ids)
            if n == 0:
                continue
            parts.append(
                pa.table(
                    {
                        "query_id": pa.array(
                            np.full(n, row["query_id"], dtype=np.int64)
                        ),
                        "k": pa.array(np.full(n, row["k"], dtype=np.int64)),
                        "page": pa.array(np.full(n, row["page"], dtype=np.int64)),
                        "group_by": pa.array([bool(row["group_by"])] * n),
                        "sort_by": pa.array([row["sort_by"]] * n),
                        "repo": pa.array(list(names), type=pa.string()),
                        "doc_id": pa.array(ids),
                        "score": pa.array(sc),
                        "dl": pa.array(dls),
                        "sortv": pa.array(sortv),
                    },
                    schema=local_schema,
                )
            )
        if not parts:
            return local_schema.empty_table()
        return pa.concat_tables(parts)

    local = qds.groupby("shard").map_groups(score_shard, batch_format="pyarrow")

    out_schema = pa.schema(
        [("query_id", pa.int64()), ("rank", pa.int64()),
         ("repo", pa.string()), ("doc_id", pa.int64()),
         ("score", pa.float64()), ("dl", pa.int64())]
    )

    def merge_query(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return out_schema.empty_table()
        k = int(g["k"][0].as_py())
        page = max(1, int(g["page"][0].as_py()))
        grouped = bool(g["group_by"][0].as_py())
        qid = int(g["query_id"][0].as_py())
        ids = g["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        sc = g["score"].to_numpy(zero_copy_only=False)
        dls = g["dl"].to_numpy(zero_copy_only=False).astype(np.int64)
        sortv = g["sortv"].to_numpy(zero_copy_only=False)
        repos = g["repo"].to_numpy(zero_copy_only=False)
        if grouped:
            gcodes = np.unique(repos.astype(str), return_inverse=True)[1]
            order = np.lexsort((ids, -sortv, gcodes))
            g_sorted = gcodes[order]
            first = np.ones(len(order), dtype=bool)
            first[1:] = g_sorted[1:] != g_sorted[:-1]
            sel = order[first]
        else:
            sel = np.arange(len(ids))
        offset = (page - 1) * k
        top = sel[np.lexsort((ids[sel], -sortv[sel]))][offset : offset + k]
        return pa.table(
            {
                "query_id": pa.array(np.full(len(top), qid, dtype=np.int64)),
                "rank": pa.array(
                    np.arange(offset + 1, offset + 1 + len(top), dtype=np.int64)
                ),
                "repo": pa.array([str(r) for r in repos[top]], pa.string()),
                "doc_id": pa.array(ids[top]),
                "score": pa.array(round6(sc[top])),
                "dl": pa.array(dls[top]),
            },
            schema=out_schema,
        )

    return local.groupby("query_id").map_groups(
        merge_query, batch_format="pyarrow"
    )
