"""filter_by / group_by search surfaces (Typesense search parameters).

The reference drives its search engine with two parameters this engine
did not yet serve:

* ``filter_by`` — AND-composed equality predicates restricting matches,
  e.g. ``registry:=pypi`` (``/root/reference/src/pyf/aggregator/db.py:
  273-277``) or ``name:=pkg && registry:=npm`` (``db.py:316-318``,
  ``enrichers/github.py:169``). Filters apply to the candidate set
  BEFORE ranking; BM25 statistics stay collection-global.
* ``group_by`` — grouped search collapsing hits to one representative
  per group: ``db.py:253-273`` walks unique package names via
  ``group_by: name``; the enrichers use ``group_by: name_sortable`` with
  one hit per group for newest-per-package
  (``enrichers/downloads.py:56``, ``health_calculator.py:47``). Each
  group is represented by its best-scoring document; groups rank by that
  document's score (tiebreak doc_id asc), top-k groups returned.

Both are served from index artifacts only (postings + the docs/ doc-meta
parquet written by the build) through actor-pool scorer stages — no
corpus access on the query path.

Scale notes (100 TB): the allowed-id set for one filter conjunction is a
column-pruned predicate scan of the ``docs/`` artifact, cached per actor
per filter string — at 10^12-doc scale this becomes a per-value facet
posting artifact (same layout as the term postings), which slots into
``FilteredScorerStage._allowed_ids`` without touching the scoring path.
The group mapping is a doc-id-sorted dictionary-encoded column cached
once per actor; sharding the scorer pool by doc-id range bounds its
per-actor footprint.
"""

from __future__ import annotations

import os
from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads

import ray
import ray.data

from ..config import DEFAULT, EngineConfig
from ..functions.rounding import round6, sql_round6
from ..sources.corpus import CORPUS_SQL
from . import query as q

# ---------------------------------------------------------------------------
# filter_by
# ---------------------------------------------------------------------------

# (query_id, query, k, lang-filter | None, repo-filter | None) — covers a
# single-field filter, a hot term + filter, a repo filter, an AND
# conjunction, a filter value matching nothing, and k > match count.
FILTERED_QUERIES: list[tuple[int, str, int, str | None, str | None]] = [
    (0, "merge sort", 10, "en", None),
    (1, "the", 10, "fr", None),  # hot term, filter prunes most hits
    (2, "customer value", 10, None, "org/src3"),
    (3, "query", 5, "en", "org/src1"),  # AND conjunction
    (4, "spark", 10, "xx", None),  # filter value matches no docs
    (5, "vector window agg", 100, "de", None),  # k above match count
]


def _filter_by_string(lang: str | None, repo: str | None) -> str:
    clauses = []
    if lang is not None:
        clauses.append(f"lang:={lang}")
    if repo is not None:
        clauses.append(f"repo:={repo}")
    return " && ".join(clauses)


class FilteredScorerStage:
    """Actor-pool stage: (query_id, query, k, filter_by) -> top-k rows.

    Index + doc-meta handles load once per actor; the allowed-id array
    for each distinct ``filter_by`` string is materialized on first use
    via a column-pruned predicate scan of the docs/ artifact and cached
    (reference pattern: memoized per-process caches,
    ``enrichers/github.py:126-137``).
    """

    def __init__(self, index_path: str, cfg: EngineConfig | None = None):
        self.reader = q.IndexReader(index_path, cfg)
        self._docs = pads.dataset(os.path.join(self.reader.vdir, "docs"))
        self._allowed: dict[str, np.ndarray] = {}

    def _allowed_ids(self, filter_by: str) -> np.ndarray:
        cached = self._allowed.get(filter_by)
        if cached is None:
            expr = None
            for clause in filter_by.split(" && "):
                field, _, value = clause.partition(":=")
                e = pads.field(field.strip()) == value.strip()
                expr = e if expr is None else (expr & e)
            tbl = self._docs.to_table(columns=["doc_id"], filter=expr)
            ids = np.sort(
                tbl["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            )
            cached = self._allowed[filter_by] = ids
        return cached

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids, ranks, docs, scores = [], [], [], []
        for qid, query, k, filt in zip(
            batch["query_id"].to_pylist(),
            batch["query"].to_pylist(),
            batch["k"].to_pylist(),
            batch["filter_by"].to_pylist(),
        ):
            allowed = self._allowed_ids(filt) if filt else None
            for rank, doc_id, score in self.reader.score(
                query, k, allowed_ids=allowed
            ):
                qids.append(qid)
                ranks.append(rank)
                docs.append(doc_id)
                scores.append(score)
        return pa.table(
            {
                "query_id": pa.array(qids, type=pa.int64()),
                "rank": pa.array(ranks, type=pa.int64()),
                "doc_id": pa.array(docs, type=pa.int64()),
                "score": pa.array(round6(np.array(scores, dtype=np.float64))),
            }
        )


def filtered_search(sf_dir: str) -> pa.Table:
    from .registry import ensure_index

    root = ensure_index(sf_dir)
    qds = ray.data.from_arrow(
        pa.table(
            {
                "query_id": pa.array([f[0] for f in FILTERED_QUERIES], pa.int64()),
                "query": pa.array([f[1] for f in FILTERED_QUERIES], pa.string()),
                "k": pa.array([f[2] for f in FILTERED_QUERIES], pa.int64()),
                "filter_by": pa.array(
                    [_filter_by_string(f[3], f[4]) for f in FILTERED_QUERIES],
                    pa.string(),
                ),
            }
        )
    )
    out = (
        qds.map_batches(
            FilteredScorerStage,
            fn_constructor_args=(root,),
            batch_format="pyarrow",
            batch_size=4,
            concurrency=2,
        )
        .to_pandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    return pa.Table.from_pandas(out, preserve_index=False)


def filtered_search_sql(
    queries: list[tuple[int, str, int, str | None, str | None]] | None = None,
    cfg: EngineConfig | None = None,
) -> str:
    """Identical BM25 + equality-filter top-k in DuckDB. The filter joins
    the derived corpus (the independent source of lang/repo) and applies
    before ranking, mirroring the engine's allowed-id restriction."""
    queries = queries or FILTERED_QUERIES
    cfg = cfg or DEFAULT

    def _lit(v: str | None) -> str:
        return q._sql_quote(v) if v is not None else "CAST(NULL AS VARCHAR)"

    values = ",\n    ".join(
        f"({qid}, {q._sql_quote(text)}, {k}, {_lit(lang)}, {_lit(repo)})"
        for qid, text, k, lang, repo in queries
    )
    return f"""
WITH corpus AS ({CORPUS_SQL}),
toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(content), '[a-z0-9]+')) AS term
  FROM corpus
),
tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM toks GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM toks GROUP BY 1),
stats AS (
  SELECT (SELECT count(*) FROM corpus) AS n,
         (SELECT sum(dl) * 1.0 FROM dl) / (SELECT count(*) FROM corpus) AS avgdl
),
df AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY 1),
queries(query_id, query, k, f_lang, f_repo) AS (VALUES
    {values}
),
qterms AS (
  SELECT DISTINCT query_id, k, f_lang, f_repo,
         unnest(regexp_extract_all(lower(query), '[a-z0-9]+')) AS term
  FROM queries
),
scored AS (
  SELECT q.query_id, q.k, tf.doc_id,
         sum(
           ln(1 + ((SELECT n FROM stats) - df.df + 0.5) / (df.df + 0.5))
           * (tf.tf * ({cfg.k1} + 1))
             / (tf.tf + {cfg.k1} * (1 - {cfg.b} + {cfg.b} * dl.dl / (SELECT avgdl FROM stats)))
         ) AS score
  FROM qterms q
  JOIN tf ON tf.term = q.term
  JOIN df ON df.term = q.term
  JOIN dl ON dl.doc_id = tf.doc_id
  JOIN corpus c ON c.doc_id = tf.doc_id
  WHERE (q.f_lang IS NULL OR c.lang = q.f_lang)
    AND (q.f_repo IS NULL OR c.repo = q.f_repo)
  GROUP BY 1, 2, 3
),
ranked AS (
  SELECT query_id, k, doc_id, score,
         row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id) AS rnk
  FROM scored
)
SELECT query_id, rnk AS rank, doc_id, {sql_round6('score')} AS score
FROM ranked WHERE rnk <= k
ORDER BY query_id, rank
"""


# ---------------------------------------------------------------------------
# group_by
# ---------------------------------------------------------------------------

GROUP_FIELD = "repo"
# (query_id, query, k-groups) — multi-term, hot term (every group
# matches), single-term fast path, absent term.
GROUPED_QUERIES: list[tuple[int, str, int]] = [
    (0, "merge sort", 5),
    (1, "the", 10),
    (2, "customer value", 5),
    (3, "spark", 3),
    (4, "nonexistentterm42", 5),
]


class GroupedScorerStage:
    """Actor-pool stage: (query_id, query, k) -> top-k GROUP rows.

    The doc-id -> group mapping loads once per actor from the docs/
    artifact (dictionary-encoded, doc-id-sorted). Per query: full
    accumulation, vectorized best-per-group collapse (lexsort by
    (group, -score, doc_id), first row per group), then group ranking by
    representative score.
    """

    def __init__(
        self,
        index_path: str,
        group_field: str = GROUP_FIELD,
        cfg: EngineConfig | None = None,
    ):
        self.reader = q.IndexReader(index_path, cfg)
        tbl = pads.dataset(os.path.join(self.reader.vdir, "docs")).to_table(
            columns=["doc_id", group_field]
        )
        ids = tbl["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(ids)
        self._ids = ids[order]
        enc = pc.dictionary_encode(tbl[group_field].combine_chunks())
        self._codes = enc.indices.to_numpy(zero_copy_only=False).astype(
            np.int64
        )[order]
        self._names = enc.dictionary.to_pylist()

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids, ranks, groups, docs, scores = [], [], [], [], []
        for qid, query, k in zip(
            batch["query_id"].to_pylist(),
            batch["query"].to_pylist(),
            batch["k"].to_pylist(),
        ):
            uniq, sc = self.reader.accumulate(query)
            if len(uniq) == 0:
                continue
            pos = np.searchsorted(self._ids, uniq)
            # a posting doc_id absent from the docs/ artifact (torn or
            # inconsistent version) must not IndexError past the end or
            # silently land in the wrong group — drop it explicitly
            ok = (pos < len(self._ids)) & (
                self._ids[np.minimum(pos, len(self._ids) - 1)] == uniq
            )
            uniq, sc, pos = uniq[ok], sc[ok], pos[ok]
            if len(uniq) == 0:
                continue
            gid = self._codes[pos]
            # best doc per group: sort (group, score desc, doc_id asc),
            # keep each group's first row
            order = np.lexsort((uniq, -sc, gid))
            g_sorted = gid[order]
            first = np.ones(len(order), dtype=bool)
            first[1:] = g_sorted[1:] != g_sorted[:-1]
            sel = order[first]
            # rank groups by their representative's (score desc, doc_id)
            top = sel[np.lexsort((uniq[sel], -sc[sel]))][:k]
            for rank, i in enumerate(top):
                qids.append(qid)
                ranks.append(rank + 1)
                groups.append(self._names[gid[i]])
                docs.append(int(uniq[i]))
                scores.append(float(sc[i]))
        return pa.table(
            {
                "query_id": pa.array(qids, type=pa.int64()),
                "rank": pa.array(ranks, type=pa.int64()),
                GROUP_FIELD: pa.array(groups, type=pa.string()),
                "doc_id": pa.array(docs, type=pa.int64()),
                "score": pa.array(round6(np.array(scores, dtype=np.float64))),
            }
        )


def grouped_search(sf_dir: str) -> pa.Table:
    from .registry import ensure_index

    root = ensure_index(sf_dir)
    qds = ray.data.from_arrow(
        pa.table(
            {
                "query_id": pa.array([g[0] for g in GROUPED_QUERIES], pa.int64()),
                "query": pa.array([g[1] for g in GROUPED_QUERIES], pa.string()),
                "k": pa.array([g[2] for g in GROUPED_QUERIES], pa.int64()),
            }
        )
    )
    out = (
        qds.map_batches(
            GroupedScorerStage,
            fn_constructor_args=(root,),
            batch_format="pyarrow",
            batch_size=4,
            concurrency=2,
        )
        .to_pandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    return pa.Table.from_pandas(out, preserve_index=False)


def grouped_search_sql(
    queries: list[tuple[int, str, int]] | None = None,
    cfg: EngineConfig | None = None,
) -> str:
    queries = queries or GROUPED_QUERIES
    cfg = cfg or DEFAULT
    values = ",\n    ".join(
        f"({qid}, {q._sql_quote(text)}, {k})" for qid, text, k in queries
    )
    return f"""
WITH corpus AS ({CORPUS_SQL}),
toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(content), '[a-z0-9]+')) AS term
  FROM corpus
),
tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM toks GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM toks GROUP BY 1),
stats AS (
  SELECT (SELECT count(*) FROM corpus) AS n,
         (SELECT sum(dl) * 1.0 FROM dl) / (SELECT count(*) FROM corpus) AS avgdl
),
df AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY 1),
queries(query_id, query, k) AS (VALUES
    {values}
),
qterms AS (
  SELECT DISTINCT query_id, k,
         unnest(regexp_extract_all(lower(query), '[a-z0-9]+')) AS term
  FROM queries
),
scored AS (
  SELECT q.query_id, q.k, tf.doc_id, c.{GROUP_FIELD},
         sum(
           ln(1 + ((SELECT n FROM stats) - df.df + 0.5) / (df.df + 0.5))
           * (tf.tf * ({cfg.k1} + 1))
             / (tf.tf + {cfg.k1} * (1 - {cfg.b} + {cfg.b} * dl.dl / (SELECT avgdl FROM stats)))
         ) AS score
  FROM qterms q
  JOIN tf ON tf.term = q.term
  JOIN df ON df.term = q.term
  JOIN dl ON dl.doc_id = tf.doc_id
  JOIN corpus c ON c.doc_id = tf.doc_id
  GROUP BY 1, 2, 3, 4
),
best AS (
  SELECT query_id, k, {GROUP_FIELD}, doc_id, score,
         row_number() OVER (
           PARTITION BY query_id, {GROUP_FIELD}
           ORDER BY score DESC, doc_id
         ) AS rn
  FROM scored
),
ranked AS (
  SELECT query_id, k, {GROUP_FIELD}, doc_id, score,
         row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id) AS rnk
  FROM best WHERE rn = 1
)
SELECT query_id, rnk AS rank, {GROUP_FIELD}, doc_id, {sql_round6('score')} AS score
FROM ranked WHERE rnk <= k
ORDER BY query_id, rank
"""


# ---------------------------------------------------------------------------
# phrase search (positional artifact)
# ---------------------------------------------------------------------------

# (query_id, phrase, k) — adjacent pair, hot pair, 3-token phrase, pair
# whose tokens co-occur but (mostly) not adjacently, absent phrase,
# single-token degenerate case.
PHRASE_QUERIES: list[tuple[int, str, int]] = [
    (0, "merge sort", 10),
    (1, "of the", 10),
    (2, "customer value analysis", 10),
    (3, "data the", 10),
    (4, "nonexistentterm42 sort", 5),
    (5, "spark", 5),
]

_POS_SHIFT = 32  # (doc_id << 32 | pos) packing for the adjacency intersect
# positions artifact: doc-range bucket width (doc_id >> shift). Rows are
# sorted (term, bucket), so a cold hot-term read can skip every row
# group outside the rarest term's candidate doc ranges.
_POS_BUCKET_SHIFT = 14  # 16384 docs per bucket


def _phrase_tokens(query: str) -> list[str]:
    """ORDERED tokens (duplicates kept) — phrase semantics need sequence,
    unlike :func:`..functions.tokenizer.tokenize_query`'s distinct-sorted
    bag used for scoring."""
    import re

    return re.findall("[a-z0-9]+", query.lower())


def ensure_positions_artifact(
    sf_dir: str, vdir: str, corpus: "ray.data.Dataset | None" = None
) -> str:
    """Build (once per index version) the positional artifact: one row per
    token occurrence, ``(term, doc_id, pos)``, term-sorted so query-time
    reads are predicate-pushdown lookups on the phrase's terms only.

    Positions are derived fully vectorized (token flatten + parent
    offsets — no Python loop over rows). This is build-side work amortized
    over every phrase query, same contract as the main postings build; at
    10^12-doc scale the rows would flow through the identical salted
    shuffle + delta-varint encode as the term postings (the artifact is
    ~the corpus token count in rows).

    STALENESS CONTRACT: the artifact belongs to the index VERSION (it
    lives in ``vdir`` and rides along on recreate/migrate copies). The
    default corpus source is ``read_corpus(sf_dir)``, correct only when
    the version indexes exactly that corpus; for an incrementally-updated
    version, pass the version's true corpus via ``corpus=`` — a new
    version dir never inherits the artifact, so the lazy rebuild is the
    natural hook.
    """
    path = os.path.join(vdir, "positions")
    marker = os.path.join(path, "_SUCCESS")
    if os.path.exists(marker):
        return path

    from ..functions.tokenizer import tokenize_column
    from ..sources.corpus import read_corpus

    def to_positions(t: pa.Table) -> pa.Table:
        tokens = tokenize_column(t["content"])
        flat = tokens.flatten()
        parent = tokens.value_parent_indices().to_numpy(zero_copy_only=False)
        offsets = np.asarray(tokens.offsets)[:-1]
        pos = np.arange(len(flat), dtype=np.int64) - offsets[parent]
        doc_ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        docs = doc_ids[parent]
        return pa.table(
            {
                "term": flat,
                "bucket": pa.array(docs >> _POS_BUCKET_SHIFT, type=pa.int64()),
                "doc_id": pa.array(docs, type=pa.int64()),
                "pos": pa.array(pos, type=pa.int64()),
            }
        )

    src = corpus if corpus is not None else read_corpus(sf_dir)
    # sorted (term, bucket): parquet row-group min/max stats then let a
    # query skip every block of a hot term outside its candidate doc
    # ranges (the position-skip structure — round-3 verdict #6); small
    # row groups keep the skip granularity fine
    src.select_columns(["doc_id", "content"]).map_batches(
        to_positions, batch_format="pyarrow"
    ).sort(["term", "bucket"]).write_parquet(path, row_group_size=65536)
    open(marker, "w").close()
    return path


def ensure_nextword_artifact(
    sf_dir: str, vdir: str, corpus: "ray.data.Dataset | None" = None
) -> str:
    """Build (once per index version) the NEXT-WORD index: one row per
    adjacent token pair, ``(bigram, doc_id, pos)``, bigram-sorted for
    pushdown. The standard lever for hot-hot phrases (both terms
    frequent): the bigram's row count equals the PHRASE frequency, so a
    cold 'merge sort' reads ~matches rows instead of two full hot
    position lists. Same build-side cost profile as the positions
    artifact (one row per token occurrence); a deployment picks this for
    exact-phrase workloads, positions for proximity/windowed ones."""
    path = os.path.join(vdir, "nextword")
    marker = os.path.join(path, "_SUCCESS")
    if os.path.exists(marker):
        return path

    from ..functions.tokenizer import tokenize_column
    from ..sources.corpus import read_corpus

    def to_bigrams(t: pa.Table) -> pa.Table:
        out_schema = pa.schema(
            [("bigram", pa.string()), ("doc_id", pa.int64()),
             ("pos", pa.int64())]
        )
        tokens = tokenize_column(t["content"])
        flat = tokens.flatten()
        n = len(flat)
        if n == 0:
            return out_schema.empty_table()
        parent = tokens.value_parent_indices().to_numpy(zero_copy_only=False)
        offsets = np.asarray(tokens.offsets)[:-1]
        pos = np.arange(n, dtype=np.int64) - offsets[parent]
        doc_ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        docs = doc_ids[parent]
        # adjacent pairs within the same doc (vectorized arrow concat)
        keep = np.zeros(n, dtype=bool)
        keep[:-1] = parent[:-1] == parent[1:]
        left = flat.filter(pa.array(keep))
        right_mask = np.zeros(n, dtype=bool)
        right_mask[1:] = keep[:-1]
        right = flat.filter(pa.array(right_mask))
        bigram = pc.binary_join_element_wise(left, right, " ")
        return pa.table(
            {
                "bigram": bigram,
                "doc_id": pa.array(docs[keep], type=pa.int64()),
                "pos": pa.array(pos[keep], type=pa.int64()),
            }
        )

    src = corpus if corpus is not None else read_corpus(sf_dir)
    src.select_columns(["doc_id", "content"]).map_batches(
        to_bigrams, batch_format="pyarrow"
    ).sort("bigram").write_parquet(path, row_group_size=65536)
    open(marker, "w").close()
    return path


class PhraseScorerStage:
    """Actor-pool stage: (query_id, query, k) -> top-k rows for EXACT
    phrase matches (tokens adjacent, in order — the quoted-phrase
    semantics of the reference's search engine).

    Match: candidate (doc, pos) sets per term come from pushdown reads of
    the positional artifact (cached per actor per term); adjacency is one
    vectorized sorted-set intersection over packed (doc_id << 32 | pos)
    keys. Matching docs then rank by standard BM25 over the phrase's
    terms (collection-global stats), reusing the allowed-id restriction.

    With a next-word artifact (``nextword_path``), multi-token phrases
    intersect BIGRAM key sets instead — each bigram's cardinality is the
    pair's phrase frequency, so hot-hot phrases stop being bound by two
    full hot position lists.
    """

    def __init__(self, index_path: str, positions_path: str,
                 cfg: EngineConfig | None = None,
                 nextword_path: str | None = None):
        self.reader = q.IndexReader(index_path, cfg)
        self._pos = pads.dataset(positions_path)
        self._next = pads.dataset(nextword_path) if nextword_path else None
        self._ng_keys: dict[str, np.ndarray] = {}       # per-bigram packed
        # old artifacts (pre-bucket format) fall back to full-term loads
        self._has_buckets = "bucket" in self._pos.schema.names
        self._keys: dict[str, np.ndarray] = {}          # full per-term
        self._bkeys: dict[str, dict[int, np.ndarray]] = {}  # per (term, bucket)

    @staticmethod
    def _pack(tbl: pa.Table) -> np.ndarray:
        doc = tbl["doc_id"].to_numpy(zero_copy_only=False)
        pos = tbl["pos"].to_numpy(zero_copy_only=False)
        # 32/32 packing breaks silently past 2^32 ids/positions (the
        # design-point guard; same check as dedup's pair packing) —
        # fail loudly, don't corrupt adjacency keys
        if len(doc) and (
            int(doc.max()) >> _POS_SHIFT or int(pos.max()) >> _POS_SHIFT
        ):
            raise ValueError(
                "doc_id/pos >= 2^32: packed adjacency keys would corrupt"
            )
        return np.sort((doc << _POS_SHIFT) | pos)

    def _full_keys(self, terms: list[str]) -> dict[str, np.ndarray]:
        # one pushdown read PER term, issued concurrently (the artifact
        # is term-sorted, so each read touches only that term's row
        # groups) — never materialize the term strings themselves: a hot
        # term has millions of rows and a to_pylist/argsort over them
        # dominated phrase latency at the 3M-doc scale smoke
        from concurrent.futures import ThreadPoolExecutor

        missing = [t for t in set(terms) if t not in self._keys]
        if missing:

            def load(t: str) -> tuple[str, np.ndarray]:
                tbl = self._pos.to_table(
                    columns=["doc_id", "pos"], filter=pads.field("term") == t
                )
                return t, self._pack(tbl)

            with ThreadPoolExecutor(max_workers=min(4, len(missing))) as ex:
                for t, arr in ex.map(load, missing):
                    self._keys[t] = arr
        return {t: self._keys[t] for t in terms}

    def _bucket_keys(self, term: str, buckets: np.ndarray) -> np.ndarray:
        """Positions of ``term`` restricted to the candidate doc-range
        ``buckets`` (sorted int64) — the position-skip read: sorted
        (term, bucket) row groups let parquet statistics skip every
        block of a hot term outside the rarest term's doc ranges. Loaded
        buckets cache per actor; a term already fully cached serves from
        memory. Bucket arrays concatenate in bucket order, which IS
        packed-key order (keys lead with doc_id), so the result stays
        sorted without a re-sort."""
        if term in self._keys:
            full = self._keys[term]
            mask = np.isin((full >> _POS_SHIFT) >> _POS_BUCKET_SHIFT, buckets)
            return full[mask]
        cache = self._bkeys.setdefault(term, {})
        missing = [int(b) for b in buckets if int(b) not in cache]
        if missing:
            tbl = self._pos.to_table(
                columns=["bucket", "doc_id", "pos"],
                filter=(pads.field("term") == term)
                & pads.field("bucket").isin(missing),
            )
            barr = tbl["bucket"].to_numpy(zero_copy_only=False).astype(np.int64)
            for b in missing:
                cache[b] = self._pack(tbl.filter(pa.array(barr == b)))
        parts = [cache[int(b)] for b in buckets]
        return np.concatenate(parts) if parts else np.empty(0, np.int64)

    def _term_keys(self, terms: list[str]) -> dict[str, np.ndarray]:
        """Per-term packed (doc<<32|pos) arrays for the phrase's terms:
        the RAREST term (by the main index's df — already cached in the
        reader for scoring) loads fully; every other term loads only the
        rarest's candidate buckets."""
        uniq = list(dict.fromkeys(terms))
        if not self._has_buckets or len(uniq) == 1:
            return self._full_keys(uniq)
        dfs = {t: v[2] for t, v in self.reader.lookup(uniq).items()}
        if len(dfs) < len(uniq):  # a term missing from the index
            return {t: np.empty(0, np.int64) for t in uniq}
        rare = min(uniq, key=lambda t: (dfs[t], t))
        rare_keys = self._full_keys([rare])[rare]
        if rare_keys.size == 0:
            return {t: np.empty(0, np.int64) for t in uniq}
        buckets = np.unique((rare_keys >> _POS_SHIFT) >> _POS_BUCKET_SHIFT)
        out = {rare: rare_keys}
        for t in uniq:
            if t != rare:
                out[t] = self._bucket_keys(t, buckets)
        return out

    @staticmethod
    def _sorted_intersect(a: np.ndarray, b: np.ndarray) -> np.ndarray:
        """Intersection of two SORTED UNIQUE int64 arrays in
        O(|small| log |big|) — np.intersect1d re-sorts the concatenation
        (O((|a|+|b|) log)), which dominated warm phrase latency when one
        term was hot."""
        if a.size > b.size:
            a, b = b, a
        if a.size == 0:
            return a
        idx = np.searchsorted(b, a)
        idx[idx == b.size] = 0
        return a[b[idx] == a]

    def _bigram_keys(self, bigrams: list[str]) -> dict[str, np.ndarray]:
        from concurrent.futures import ThreadPoolExecutor

        missing = [b for b in set(bigrams) if b not in self._ng_keys]
        if missing:

            def load(b: str) -> tuple[str, np.ndarray]:
                tbl = self._next.to_table(
                    columns=["doc_id", "pos"], filter=pads.field("bigram") == b
                )
                return b, self._pack(tbl)

            with ThreadPoolExecutor(max_workers=min(4, len(missing))) as ex:
                for b, arr in ex.map(load, missing):
                    self._ng_keys[b] = arr
        return {b: self._ng_keys[b] for b in bigrams}

    def _match_docs_nextword(self, toks: list[str]) -> np.ndarray:
        """Adjacency via the next-word index: a phrase t0..tn matches at
        p iff bigram (t_i, t_{i+1}) occurs at p+i for every i — the same
        shifted packed-key intersection, over (n-1) bigram sets whose
        sizes are PAIR frequencies (tiny for hot-hot pairs)."""
        bigrams = [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        keys = self._bigram_keys(bigrams)
        shifted = [(keys[b].size, keys[b] - i) for i, b in enumerate(bigrams)]
        if any(size == 0 for size, _ in shifted):
            return np.empty(0, dtype=np.int64)
        shifted.sort(key=lambda x: x[0])
        survivors = shifted[0][1]
        for _, arr in shifted[1:]:
            if survivors.size == 0:
                break
            survivors = self._sorted_intersect(survivors, arr)
        return np.unique(survivors >> _POS_SHIFT)

    def match_docs(self, phrase: str) -> np.ndarray:
        toks = _phrase_tokens(phrase)
        if not toks:
            return np.empty(0, dtype=np.int64)
        if len(toks) == 1:
            # single-token "phrase" = docs containing the term — the
            # main index's posting list answers without touching the
            # positional artifact at all
            found = self.reader.lookup(toks)
            return (
                found[toks[0]][0].astype(np.int64, copy=True)
                if toks[0] in found
                else np.empty(0, dtype=np.int64)
            )
        if self._next is not None:
            return self._match_docs_nextword(toks)
        keys = self._term_keys(toks)
        # shift every term's keys to the position-0 anchor; adjacency is
        # a symmetric conjunction, so intersect in ascending-size order
        # (rarest term first) with early exit — survivors shrink to the
        # rarest term's cardinality after the first intersect instead of
        # carrying a hot first token through the whole chain
        shifted = [(keys[t].size, keys[t] - i) for i, t in enumerate(toks)]
        if any(size == 0 for size, _ in shifted):
            return np.empty(0, dtype=np.int64)
        shifted.sort(key=lambda x: x[0])
        survivors = shifted[0][1]
        for _, arr in shifted[1:]:
            if survivors.size == 0:
                break
            survivors = self._sorted_intersect(survivors, arr)
        return np.unique(survivors >> _POS_SHIFT)

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids, ranks, docs, scores = [], [], [], []
        for qid, query, k in zip(
            batch["query_id"].to_pylist(),
            batch["query"].to_pylist(),
            batch["k"].to_pylist(),
        ):
            allowed = self.match_docs(query)
            for rank, doc_id, score in self.reader.score(
                query, k, allowed_ids=allowed
            ):
                qids.append(qid)
                ranks.append(rank)
                docs.append(doc_id)
                scores.append(score)
        return pa.table(
            {
                "query_id": pa.array(qids, type=pa.int64()),
                "rank": pa.array(ranks, type=pa.int64()),
                "doc_id": pa.array(docs, type=pa.int64()),
                "score": pa.array(round6(np.array(scores, dtype=np.float64))),
            }
        )


def phrase_search(sf_dir: str) -> pa.Table:
    from ..state import manifest as mf
    from .registry import ensure_index

    root = ensure_index(sf_dir)
    vdir = mf.read_alias(root)
    pos_path = ensure_positions_artifact(sf_dir, vdir)
    nw_path = ensure_nextword_artifact(sf_dir, vdir)
    qds = ray.data.from_arrow(
        pa.table(
            {
                "query_id": pa.array([p[0] for p in PHRASE_QUERIES], pa.int64()),
                "query": pa.array([p[1] for p in PHRASE_QUERIES], pa.string()),
                "k": pa.array([p[2] for p in PHRASE_QUERIES], pa.int64()),
            }
        )
    )
    out = (
        qds.map_batches(
            PhraseScorerStage,
            fn_constructor_args=(root, pos_path, None, nw_path),
            batch_format="pyarrow",
            batch_size=4,
            concurrency=2,
        )
        .to_pandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    return pa.Table.from_pandas(out, preserve_index=False)


def phrase_search_sql(
    queries: list[tuple[int, str, int]] | None = None,
    cfg: EngineConfig | None = None,
) -> str:
    """Phrase adjacency in SQL: the space-joined token stream of a doc
    contains the space-joined token stream of the query as a
    space-delimited substring — exactly the in-order adjacency the
    positional intersect computes. Scoring is BM25 over the phrase's
    distinct terms restricted to phrase-matching docs."""
    queries = queries or PHRASE_QUERIES
    cfg = cfg or DEFAULT
    values = ",\n    ".join(
        f"({qid}, {q._sql_quote(text)}, {k})" for qid, text, k in queries
    )
    return f"""
WITH corpus AS ({CORPUS_SQL}),
toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(content), '[a-z0-9]+')) AS term
  FROM corpus
),
stream AS (
  SELECT doc_id,
         ' ' || array_to_string(regexp_extract_all(lower(content), '[a-z0-9]+'), ' ') || ' ' AS s
  FROM corpus
),
tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM toks GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM toks GROUP BY 1),
stats AS (
  SELECT (SELECT count(*) FROM corpus) AS n,
         (SELECT sum(dl) * 1.0 FROM dl) / (SELECT count(*) FROM corpus) AS avgdl
),
df AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY 1),
queries(query_id, query, k) AS (VALUES
    {values}
),
qphrase AS (
  SELECT query_id, k,
         array_to_string(regexp_extract_all(lower(query), '[a-z0-9]+'), ' ') AS phrase
  FROM queries
),
qterms AS (
  SELECT DISTINCT query_id, k,
         unnest(regexp_extract_all(lower(query), '[a-z0-9]+')) AS term
  FROM queries
),
matches AS (
  SELECT p.query_id, s.doc_id
  FROM qphrase p JOIN stream s
    ON p.phrase <> '' AND position(' ' || p.phrase || ' ' IN s.s) > 0
),
scored AS (
  SELECT q.query_id, q.k, tf.doc_id,
         sum(
           ln(1 + ((SELECT n FROM stats) - df.df + 0.5) / (df.df + 0.5))
           * (tf.tf * ({cfg.k1} + 1))
             / (tf.tf + {cfg.k1} * (1 - {cfg.b} + {cfg.b} * dl.dl / (SELECT avgdl FROM stats)))
         ) AS score
  FROM qterms q
  JOIN tf ON tf.term = q.term
  JOIN df ON df.term = q.term
  JOIN dl ON dl.doc_id = tf.doc_id
  JOIN matches m ON m.query_id = q.query_id AND m.doc_id = tf.doc_id
  GROUP BY 1, 2, 3
),
ranked AS (
  SELECT query_id, k, doc_id, score,
         row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id) AS rnk
  FROM scored
)
SELECT query_id, rnk AS rank, doc_id, {sql_round6('score')} AS score
FROM ranked WHERE rnk <= k
ORDER BY query_id, rank
"""


# ---------------------------------------------------------------------------
# negation operator (`-term` exclusions)
# ---------------------------------------------------------------------------

# (query_id, query, k) — plain exclusion, hot positive + exclusion,
# absent-term exclusion (no-op), self-exclusion (kills every hit), hot
# exclusion pruning most of the corpus.
NEGATION_QUERIES: list[tuple[int, str, int]] = [
    (0, "merge sort -python", 10),
    (1, "the -merge", 10),
    (2, "customer value -nonexistentterm42", 10),
    (3, "merge -merge", 5),
    (4, "spark query -the", 10),
]


def parse_negation(query: str) -> tuple[str, list[str]]:
    """Split a query into (positive query, excluded terms): whitespace
    words with a ``-`` prefix are exclusions (the search engine's
    negation operator); everything else rejoins as the scored query.
    Used by BOTH the scorer stage and the SQL-oracle builder so the two
    sides cannot drift."""
    pos, neg = [], []
    for w in query.split():
        if w.startswith("-") and len(w) > 1:
            neg.append(w[1:].lower())
        else:
            pos.append(w)
    return " ".join(pos), neg


class NegationScorerStage:
    """Actor-pool stage: (query_id, query, k) -> top-k rows where no hit
    contains any excluded term. Excluded doc-id sets come from the SAME
    cached posting lookups the scorer uses (one pushdown read per term,
    amortized per actor); exclusion applies before ranking/truncation."""

    def __init__(self, index_path: str, cfg: EngineConfig | None = None):
        self.reader = q.IndexReader(index_path, cfg)

    def _excluded_ids(self, neg_terms: list[str]) -> np.ndarray:
        if not neg_terms:
            return np.empty(0, dtype=np.int64)
        hits = self.reader.lookup(neg_terms)
        if not hits:
            return np.empty(0, dtype=np.int64)
        return np.unique(np.concatenate([ids for ids, _, _ in hits.values()]))

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids, ranks, docs, scores = [], [], [], []
        for qid, query, k in zip(
            batch["query_id"].to_pylist(),
            batch["query"].to_pylist(),
            batch["k"].to_pylist(),
        ):
            pos_q, neg = parse_negation(query)
            excl = self._excluded_ids(neg)
            for rank, doc_id, score in self.reader.score(
                pos_q, k, excluded_ids=excl
            ):
                qids.append(qid)
                ranks.append(rank)
                docs.append(doc_id)
                scores.append(score)
        return pa.table(
            {
                "query_id": pa.array(qids, type=pa.int64()),
                "rank": pa.array(ranks, type=pa.int64()),
                "doc_id": pa.array(docs, type=pa.int64()),
                "score": pa.array(round6(np.array(scores, dtype=np.float64))),
            }
        )


def negation_search(sf_dir: str) -> pa.Table:
    from .registry import ensure_index

    root = ensure_index(sf_dir)
    qds = ray.data.from_arrow(
        pa.table(
            {
                "query_id": pa.array([p[0] for p in NEGATION_QUERIES], pa.int64()),
                "query": pa.array([p[1] for p in NEGATION_QUERIES], pa.string()),
                "k": pa.array([p[2] for p in NEGATION_QUERIES], pa.int64()),
            }
        )
    )
    out = (
        qds.map_batches(
            NegationScorerStage,
            fn_constructor_args=(root,),
            batch_format="pyarrow",
            batch_size=4,
            concurrency=2,
        )
        .to_pandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    return pa.Table.from_pandas(out, preserve_index=False)


def negation_search_sql(
    queries: list[tuple[int, str, int]] | None = None,
    cfg: EngineConfig | None = None,
) -> str:
    """Oracle: BM25 over the positive terms, anti-joined against docs
    containing any excluded term (exclusion before ranking). The query
    strings are parsed by the SAME helper the engine uses."""
    queries = queries or NEGATION_QUERIES
    cfg = cfg or DEFAULT
    pos_rows, neg_rows = [], []
    for qid, query, k in queries:
        pos_q, neg = parse_negation(query)
        pos_rows.append((qid, pos_q, k))
        for t in neg:
            neg_rows.append((qid, t))
    values = ",\n    ".join(
        f"({qid}, {q._sql_quote(text)}, {k})" for qid, text, k in pos_rows
    )
    neg_values = ",\n    ".join(
        f"({qid}, {q._sql_quote(t)})" for qid, t in neg_rows
    ) or "(NULL, NULL)"
    return f"""
WITH corpus AS ({CORPUS_SQL}),
toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(content), '[a-z0-9]+')) AS term
  FROM corpus
),
tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM toks GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM toks GROUP BY 1),
stats AS (
  SELECT (SELECT count(*) FROM corpus) AS n,
         (SELECT sum(dl) * 1.0 FROM dl) / (SELECT count(*) FROM corpus) AS avgdl
),
df AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY 1),
queries(query_id, query, k) AS (VALUES
    {values}
),
qneg(query_id, term) AS (VALUES
    {neg_values}
),
qterms AS (
  SELECT DISTINCT query_id, k,
         unnest(regexp_extract_all(lower(query), '[a-z0-9]+')) AS term
  FROM queries
),
scored AS (
  SELECT qt.query_id, qt.k, tf.doc_id,
         sum(
           ln(1 + ((SELECT n FROM stats) - df.df + 0.5) / (df.df + 0.5))
           * (tf.tf * ({cfg.k1} + 1))
             / (tf.tf + {cfg.k1} * (1 - {cfg.b} + {cfg.b} * dl.dl / (SELECT avgdl FROM stats)))
         ) AS score
  FROM qterms qt
  JOIN tf ON tf.term = qt.term
  JOIN df ON df.term = qt.term
  JOIN dl ON dl.doc_id = tf.doc_id
  GROUP BY 1, 2, 3
),
surviving AS (
  SELECT s.* FROM scored s
  WHERE NOT EXISTS (
    SELECT 1 FROM tf f
    JOIN qneg n ON n.query_id = s.query_id AND n.term = f.term
    WHERE f.doc_id = s.doc_id
  )
),
ranked AS (
  SELECT query_id, k, doc_id, score,
         row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id) AS rnk
  FROM surviving
)
SELECT query_id, rnk AS rank, doc_id, {sql_round6('score')} AS score
FROM ranked WHERE rnk <= k
ORDER BY query_id, rank
"""


# ---------------------------------------------------------------------------
# composable search parameters (the reference's REAL search surface:
# filter_by + group_by + num_typos + sort_by combine in ONE request,
# /root/reference/src/pyf/aggregator/db.py:267-275 — grouped+sorted+
# filtered in a single search — and :403-426 — filtered+sorted)
# ---------------------------------------------------------------------------

# (query_id, query, k, lang-filter | None, group_by, num_typos, sort_by,
#  page). sort_by: 'score' (relevance) or 'dl' (document field, desc —
# the reference's sort_by upload_timestamp:desc analog); page: 1-based
# result page (the reference paginates EVERY retrieval with per_page +
# page loops, db.py:266-290,320-345,377-401 — rank stays the global
# rank, the window is rows (page-1)*k+1 .. page*k).
COMPOSABLE_QUERIES: list[
    tuple[int, str, int, str | None, bool, int, str, int]
] = [
    (0, "merge sort", 5, "en", True, 0, "score", 1),   # filter + group
    (1, "mergw sorrt", 5, "en", True, 2, "score", 1),  # typo + filter + group
    (2, "the", 5, None, True, 0, "dl", 1),             # group + sort_by field
    (3, "customer value", 10, "de", False, 0, "dl", 1),  # filter + sort_by
    (4, "sparc", 10, "en", True, 1, "score", 1),       # typo + filter + group
    (5, "qqqqqq", 5, "en", True, 2, "score", 1),       # empty typo expansion
    (6, "the", 5, None, False, 0, "score", 2),         # page 2: hits 6-10
    (7, "merge sort", 3, None, True, 0, "score", 2),   # page 2 of grouped
]


class ComposableScorerStage:
    """Actor-pool stage composing the reference's search parameters
    around ONE scorer pass: typo expansion (SymSpell artifact) rewrites
    the query's term set, ``filter_by`` restricts the candidate ids
    before ranking, ``group_by`` collapses hits to the best doc per
    group, and ``sort_by`` orders hits (and picks group representatives)
    by relevance or by a document field (dl desc) — no mutually-exclusive
    routes.

    Output schema is uniform across modes: (query_id, rank, repo,
    doc_id, score, dl); ungrouped rows carry their doc's repo.
    """

    def __init__(self, index_path: str, cfg: EngineConfig | None = None):
        self.reader = q.IndexReader(index_path, cfg)
        self._docs = pads.dataset(os.path.join(self.reader.vdir, "docs"))
        tbl = self._docs.to_table(columns=["doc_id", "repo", "dl"])
        ids = tbl["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(ids)
        self._ids = ids[order]
        enc = pc.dictionary_encode(tbl["repo"].combine_chunks())
        self._codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)[order]
        self._names = enc.dictionary.to_pylist()
        self._dls = tbl["dl"].to_numpy(zero_copy_only=False).astype(np.int64)[order]
        self._allowed: dict[str, np.ndarray] = {}
        self._typo_terms: dict[tuple[str, int], str] = {}

    # -- parameter stages -------------------------------------------------
    def _allowed_ids(self, filter_by: str) -> np.ndarray:
        cached = self._allowed.get(filter_by)
        if cached is None:
            expr = None
            for clause in filter_by.split(" && "):
                field, _, value = clause.partition(":=")
                e = pads.field(field.strip()) == value.strip()
                expr = e if expr is None else (expr & e)
            tbl = self._docs.to_table(columns=["doc_id"], filter=expr)
            cached = self._allowed[filter_by] = np.sort(
                tbl["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            )
        return cached

    def _expand_typos(self, query: str, budget: int) -> str:
        """Artifact-based expansion, LOCAL pyarrow pushdown reads (this
        runs inside an actor — no nested Ray Data execution), cached per
        (query, budget)."""
        key = (query, budget)
        cached = self._typo_terms.get(key)
        if cached is None:
            from ..functions.tokenizer import tokenize_query
            from .registry import (
                TYPO_ARTIFACT_DIST,
                _deletes,
                _levenshtein,
                ensure_typo_artifact,
            )

            art = ensure_typo_artifact(self.reader.vdir)
            assert budget <= TYPO_ARTIFACT_DIST
            toks = tokenize_query(query)
            keys = sorted(set().union(*(_deletes(t, budget) for t in toks))) if toks else []
            matched: set[str] = set()
            if keys:
                tbl = pads.dataset(art).to_table(
                    columns=["key", "term"],
                    filter=pads.field("key").isin(keys),
                )
                cand = set(tbl["term"].to_pylist())
                for term in cand:
                    for tok in toks:
                        if abs(len(term) - len(tok)) <= budget and _levenshtein(
                            tok, term
                        ) <= budget:
                            matched.add(term)
                            break
            cached = self._typo_terms[key] = " ".join(sorted(matched))
        return cached

    # -- one composed query -----------------------------------------------
    def run_one(
        self, query: str, k: int, filter_by: str, group_by: bool,
        num_typos: int, sort_by: str, page: int = 1,
    ) -> list[tuple[int, str, int, float, int]]:
        """-> [(rank, repo, doc_id, score, dl)]. Inline ``-term``
        negation composes too: exclusions parse out of the query, typo
        expansion applies to the positive terms only. ``page`` offsets
        into the ranked array ((page-1)*k rows skipped; ranks stay
        global) — the reference's per_page+page pagination."""
        query, neg = parse_negation(query)
        if num_typos > 0:
            query = self._expand_typos(query, num_typos)
            if not query:
                return []
        allowed = self._allowed_ids(filter_by) if filter_by else None
        uniq, sc = self.reader.accumulate(query)
        if allowed is not None and len(uniq):
            if len(allowed) == 0:
                return []
            pos = np.searchsorted(allowed, uniq)
            ok = (pos < len(allowed)) & (
                allowed[np.minimum(pos, len(allowed) - 1)] == uniq
            )
            uniq, sc = uniq[ok], sc[ok]
        if neg and len(uniq):
            hits = self.reader.lookup(neg)
            if hits:
                excl = np.unique(
                    np.concatenate([ids for ids, _, _ in hits.values()])
                )
                pos = np.searchsorted(excl, uniq)
                hit = (pos < len(excl)) & (
                    excl[np.minimum(pos, len(excl) - 1)] == uniq
                )
                uniq, sc = uniq[~hit], sc[~hit]
        if len(uniq) == 0:
            return []
        pos = np.searchsorted(self._ids, uniq)
        ok = (pos < len(self._ids)) & (
            self._ids[np.minimum(pos, len(self._ids) - 1)] == uniq
        )
        # drop posting ids absent from the docs artifact (torn version)
        uniq, sc, pos = uniq[ok], sc[ok], pos[ok]
        gid = self._codes[pos]
        dls = self._dls[pos]
        sort_key = dls.astype(np.float64) if sort_by == "dl" else sc
        if group_by:
            # best per group BY THE SORT KEY (the reference's grouped
            # hits order by sort_by; the representative is the first)
            order = np.lexsort((uniq, -sort_key, gid))
            g_sorted = gid[order]
            first = np.ones(len(order), dtype=bool)
            first[1:] = g_sorted[1:] != g_sorted[:-1]
            sel = order[first]
        else:
            sel = np.arange(len(uniq))
        offset = (max(1, page) - 1) * k
        top = sel[np.lexsort((uniq[sel], -sort_key[sel]))][offset : offset + k]
        return [
            (offset + r + 1, self._names[gid[i]], int(uniq[i]), float(sc[i]),
             int(dls[i]))
            for r, i in enumerate(top)
        ]

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids, ranks, repos, docs, scores, dls = [], [], [], [], [], []
        pages = (
            batch["page"].to_pylist()
            if "page" in batch.column_names
            else [1] * batch.num_rows
        )
        for qid, query, k, filt, grp, typos, sort_by, page in zip(
            batch["query_id"].to_pylist(),
            batch["query"].to_pylist(),
            batch["k"].to_pylist(),
            batch["filter_by"].to_pylist(),
            batch["group_by"].to_pylist(),
            batch["num_typos"].to_pylist(),
            batch["sort_by"].to_pylist(),
            pages,
        ):
            for rank, repo, doc_id, score, dl in self.run_one(
                query, k, filt, bool(grp), int(typos), sort_by, int(page)
            ):
                qids.append(qid)
                ranks.append(rank)
                repos.append(repo)
                docs.append(doc_id)
                scores.append(score)
                dls.append(dl)
        return pa.table(
            {
                "query_id": pa.array(qids, type=pa.int64()),
                "rank": pa.array(ranks, type=pa.int64()),
                "repo": pa.array(repos, type=pa.string()),
                "doc_id": pa.array(docs, type=pa.int64()),
                "score": pa.array(round6(np.array(scores, dtype=np.float64))),
                "dl": pa.array(dls, type=pa.int64()),
            }
        )


def composable_search(sf_dir: str) -> pa.Table:
    """Driver entry — served by the doc-id-SHARDED composable path
    (per-shard tasks hold O(shard) doc metadata + postings; tie-safe
    global merge), result-identical to the in-process
    ComposableScorerStage (tests/test_shardquery.py)."""
    from .registry import ensure_index
    from .shardquery import run_composable_sharded

    root = ensure_index(sf_dir)
    out = (
        run_composable_sharded(root, COMPOSABLE_QUERIES)
        .to_pandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    return pa.Table.from_pandas(out, preserve_index=False)


def composable_search_sql(
    queries: list[tuple[int, str, int, str | None, bool, int, str, int]] | None = None,
    cfg: EngineConfig | None = None,
) -> str:
    """Oracle for the composed parameters: levenshtein term expansion at
    the typo budget (lev <= 0 degenerates to exact match), equality
    filter before ranking, best-per-group collapse by the sort key,
    ranking by the sort key (score desc or dl desc, doc_id tiebreak),
    pagination via the global-rank window (LIMIT k OFFSET (page-1)*k)."""
    queries = queries or COMPOSABLE_QUERIES
    cfg = cfg or DEFAULT

    def _lit(v: str | None) -> str:
        return q._sql_quote(v) if v is not None else "CAST(NULL AS VARCHAR)"

    values = ",\n    ".join(
        f"({qid}, {q._sql_quote(text)}, {k}, {_lit(lang)}, {str(grp).upper()}, {typos}, {q._sql_quote(sort_by)}, {page})"
        for qid, text, k, lang, grp, typos, sort_by, page in queries
    )
    return f"""
WITH corpus AS ({CORPUS_SQL}),
toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(content), '[a-z0-9]+')) AS term
  FROM corpus
),
tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM toks GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM toks GROUP BY 1),
stats AS (
  SELECT (SELECT count(*) FROM corpus) AS n,
         (SELECT sum(dl) * 1.0 FROM dl) / (SELECT count(*) FROM corpus) AS avgdl
),
df AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY 1),
queries(query_id, query, k, f_lang, grp, typos, sort_by, page) AS (VALUES
    {values}
),
qtoks AS (
  SELECT DISTINCT query_id, k, f_lang, grp, typos, sort_by,
         unnest(regexp_extract_all(lower(query), '[a-z0-9]+')) AS qt
  FROM queries
),
qterms AS (
  SELECT DISTINCT q.query_id, q.k, q.f_lang, q.grp, q.typos, q.sort_by, d.term
  FROM qtoks q JOIN df d ON levenshtein(q.qt, d.term) <= q.typos
),
scored AS (
  SELECT q.query_id, q.k, q.grp, q.sort_by, tf.doc_id,
         sum(
           ln(1 + ((SELECT n FROM stats) - df.df + 0.5) / (df.df + 0.5))
           * (tf.tf * ({cfg.k1} + 1))
             / (tf.tf + {cfg.k1} * (1 - {cfg.b} + {cfg.b} * dl.dl / (SELECT avgdl FROM stats)))
         ) AS score
  FROM qterms q
  JOIN tf ON tf.term = q.term
  JOIN df ON df.term = q.term
  JOIN dl ON dl.doc_id = tf.doc_id
  JOIN corpus c ON c.doc_id = tf.doc_id
  WHERE (q.f_lang IS NULL OR c.lang = q.f_lang)
  GROUP BY 1, 2, 3, 4, 5
),
hits AS (
  SELECT s.*, c.repo, d.dl
  FROM scored s
  JOIN corpus c ON c.doc_id = s.doc_id
  JOIN dl d ON d.doc_id = s.doc_id
),
rep AS (
  SELECT *, row_number() OVER (
           PARTITION BY query_id,
                        CASE WHEN grp THEN repo ELSE doc_id::VARCHAR END
           ORDER BY CASE WHEN sort_by = 'dl' THEN dl ELSE NULL END DESC,
                    CASE WHEN sort_by = 'score' THEN score ELSE NULL END DESC,
                    doc_id ASC
         ) AS rn
  FROM hits
),
ranked AS (
  SELECT query_id, k, repo, doc_id, score, dl,
         row_number() OVER (
           PARTITION BY query_id
           ORDER BY CASE WHEN sort_by = 'dl' THEN dl ELSE NULL END DESC,
                    CASE WHEN sort_by = 'score' THEN score ELSE NULL END DESC,
                    doc_id ASC
         ) AS rnk
  FROM rep WHERE rn = 1
)
SELECT r.query_id, r.rnk AS rank, r.repo, r.doc_id,
       {sql_round6('r.score')} AS score, r.dl
FROM ranked r JOIN queries qq ON qq.query_id = r.query_id
WHERE r.rnk > (qq.page - 1) * qq.k AND r.rnk <= qq.page * qq.k
ORDER BY r.query_id, rank
"""


def register_all() -> None:
    from . import registry as r

    r.register("filtered_search", filtered_search, filtered_search_sql())
    r.register("grouped_search", grouped_search, grouped_search_sql())
    r.register("phrase_search", phrase_search, phrase_search_sql())
    r.register("negation_search", negation_search, negation_search_sql())
    r.register("composable_search", composable_search, composable_search_sql())
