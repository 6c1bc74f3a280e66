"""BM25 top-k query engine over the from-scratch inverted index.

The reference's query surface is Typesense weighted multi-field search
with ``query_by name,title,first_chapter,main_content,changelog`` and
weights ``10,10,5,3,1`` (``/root/reference/AGENTS.md:16-19``); its ranked
retrieval + sorted pagination (``db.py:377-426``) is what this module
reproduces with BM25 (k1=1.2, b=0.75) and a deterministic tiebreak
(score desc, doc_id asc).

Scoring definition (identical, by construction, in all three places —
this engine, the pytest naive oracle, and the DuckDB SQL oracle):

    idf(t)      = ln(1 + (N - df + 0.5) / (df + 0.5))
    tfn(t, d)   = tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
    score(q, d) = sum over DISTINCT query terms of idf * tfn [* weight(d)]

``avgdl`` = sum(dl) / N over ALL docs (zero-token docs included).
Query terms are tokenized with the same analyzer as documents and scored
once each (query tf ignored).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads

import ray.data

from ..config import DEFAULT, EngineConfig
from ..functions.rounding import round6, sql_round6
from ..functions.tokenizer import tokenize_query
from ..sources.corpus import CORPUS_SQL
from ..state import manifest as mf

# ---------------------------------------------------------------------------
# Reference query set (FIXTURES.md §2): rare / hot / multi-term / separator
# semantics / absent terms / k edge cases. Deterministic, stored in-repo.
# ---------------------------------------------------------------------------
QUERY_SET: list[tuple[int, str, int]] = [
    (0, "merge sort", 10),
    (1, "spark", 10),
    (2, "the", 10),  # hot term
    (3, "data-stream/batch", 5),  # separator semantics: -> data stream batch
    (4, "plone.api", 10),  # dotted name -> plone api (absent -> empty)
    (5, "vector window agg", 100),  # k larger than many match counts
    (6, "query", 1),  # k = 1
    (7, "nonexistentterm42", 10),  # empty result
    (8, "customer value", 10),
    (9, "Scan.Filter_JOIN", 10),  # mixed case + separators
]


class IndexReader:
    """Loads one index version; decodes posting lists on demand (cached).

    The term dictionary stays on disk (parquet, term-sorted row groups);
    lookups use predicate pushdown so a query reads only the row groups
    containing its terms — the scale path for a 10^12-file dictionary.
    """

    def __init__(self, index_path: str, cfg: EngineConfig | None = None):
        # accept either a version dir or an index root with an ALIAS
        live = mf.read_alias(index_path)
        self.vdir = live if live else index_path
        self.cfg = cfg or DEFAULT
        self.stats = mf.read_stats(self.vdir)
        self._postings = pads.dataset(os.path.join(self.vdir, "postings"))
        # term -> (doc_ids, per-doc BM25 contribution, df). Contributions
        # are query-independent (idf * tf-norm), so they are computed once
        # per term at load and reused by every query hitting this reader.
        self._cache: dict[str, tuple[np.ndarray, np.ndarray, int]] = {}

    def _contribution(
        self, ids: np.ndarray, tfs: np.ndarray, dls: np.ndarray, df: int
    ) -> np.ndarray:
        cfg = self.cfg
        n = self.stats["num_docs"]
        avgdl = self.stats["avgdl"]
        idf = np.log(1.0 + (n - df + 0.5) / (df + 0.5))
        return idf * (
            tfs * (cfg.k1 + 1.0)
            / (tfs + cfg.k1 * (1.0 - cfg.b + cfg.b * dls / avgdl))
        )

    def lookup(self, terms: list[str]) -> dict[str, tuple[np.ndarray, np.ndarray, int]]:
        """term -> (doc_ids, contributions, df) for terms in the index."""
        missing = [t for t in terms if t not in self._cache]
        if missing:
            tbl = self._postings.to_table(
                columns=["term", "df", "gaps", "tfs", "dls"],
                filter=pads.field("term").isin(missing),
            )
            from ..stages.postings import decode_posting_batch

            counts, ids_all, tfs_all, dls_all = decode_posting_batch(tbl)
            ends = np.cumsum(counts)
            starts = ends - counts
            # SHARD-TOLERANT: a term may span several rows (a build that
            # caps hot-term row size emits disjoint shards; today's
            # merge emits one row, but a reader that silently kept only
            # the last row would drop postings) — same-term rows
            # concatenate, df sums
            by_term: dict[str, list[int]] = {}
            for i, term in enumerate(tbl["term"].to_pylist()):
                by_term.setdefault(term, []).append(i)
            for term, idxs in by_term.items():
                if len(idxs) == 1:
                    i = idxs[0]
                    s, e = starts[i], ends[i]
                    ids, tfs, dls = ids_all[s:e], tfs_all[s:e], dls_all[s:e]
                    df = int(counts[i])
                else:
                    ids = np.concatenate([ids_all[starts[i]:ends[i]] for i in idxs])
                    tfs = np.concatenate([tfs_all[starts[i]:ends[i]] for i in idxs])
                    dls = np.concatenate([dls_all[starts[i]:ends[i]] for i in idxs])
                    # restore the sorted-posting-list invariant (shards
                    # may decode in any file order; accumulate's dense
                    # sizing and MaxScore both read ids[-1] as the max)
                    order = np.argsort(ids, kind="stable")
                    ids, tfs, dls = ids[order], tfs[order], dls[order]
                    df = int(sum(counts[i] for i in idxs))
                self._cache[term] = (
                    ids,
                    self._contribution(ids, tfs, dls, df),
                    df,
                )
            for t in missing:
                self._cache.setdefault(
                    t, (np.empty(0, np.int64), np.empty(0, np.float64), 0)
                )
        return {t: self._cache[t] for t in terms if self._cache[t][2] > 0}

    def accumulate(
        self,
        query: str,
        doc_weights: dict[int, float] | None = None,
    ) -> tuple[np.ndarray, np.ndarray]:
        """Every matching doc with its full BM25 score, unranked.

        Term-at-a-time accumulation in sorted-term order (deterministic
        float summation). Accumulation is dense (direct indexed add over
        the doc-id space) when candidate volume is large, sparse
        (sort-based) for rare terms — identical per-document addition
        order either way. Returns (doc_ids sorted asc, scores); the
        arrays may alias the per-term cache, so callers must not mutate
        them in place.
        """
        cfg = self.cfg
        n = self.stats["num_docs"]
        empty = (np.empty(0, np.int64), np.empty(0, np.float64))
        terms = tokenize_query(query)
        found = self.lookup(terms)
        if not found or n == 0:
            return empty
        parts = [found[t] for t in sorted(found)]
        total_postings = sum(len(p[0]) for p in parts)
        max_id = max(int(p[0][-1]) for p in parts)  # posting lists are sorted

        if len(parts) == 1:
            # single-term fast path: the cached per-term contributions ARE
            # the scores — no accumulation array at all (the weight
            # multiply below allocates rather than mutating the cache).
            uniq, scores = parts[0][0], parts[0][1]
        elif total_postings * 4 >= max_id:
            # dense: one float per doc id, accumulated in sorted-term
            # order. Doc ids are UNIQUE within a posting list, so a
            # direct indexed add is exact and avoids bincount's full-size
            # temporary per term (same per-doc addition order as sparse).
            dense = np.zeros(max_id + 1, dtype=np.float64)
            for ids, contrib, _ in parts:
                dense[ids] += contrib
            uniq = np.flatnonzero(dense)
            scores = dense[uniq]
        else:
            ids_cat = np.concatenate([p[0] for p in parts])
            contrib_cat = np.concatenate([p[1] for p in parts])
            uniq, inv = np.unique(ids_cat, return_inverse=True)
            scores = np.zeros(len(uniq), dtype=np.float64)
            np.add.at(scores, inv, contrib_cat)
        if doc_weights:
            w = np.array([doc_weights.get(int(d), 1.0) for d in uniq])
            scores = scores * w
        return uniq, scores

    def score(
        self,
        query: str,
        k: int | None = None,
        doc_weights: dict[int, float] | None = None,
        allowed_ids: np.ndarray | None = None,
        excluded_ids: np.ndarray | None = None,
    ) -> list[tuple[int, int, float]]:
        """Exhaustive vectorized BM25 -> [(rank, doc_id, score)].

        Tiebreak: score desc, doc_id asc. ``allowed_ids`` (sorted int64)
        restricts the candidate set BEFORE ranking — the ``filter_by``
        semantics of the reference's search engine (equality filters
        applied to matches, collection-global BM25 stats; reference
        ``db.py:273-277``). ``excluded_ids`` (sorted int64) removes docs
        BEFORE ranking — the engine's ``-term`` negation operator.
        """
        k = k if k is not None else self.cfg.default_k
        uniq, scores = self.accumulate(query, doc_weights)
        if allowed_ids is not None and len(uniq):
            if len(allowed_ids) == 0:
                return []
            pos = np.searchsorted(allowed_ids, uniq)
            ok = (pos < len(allowed_ids)) & (
                allowed_ids[np.minimum(pos, len(allowed_ids) - 1)] == uniq
            )
            uniq, scores = uniq[ok], scores[ok]
        if excluded_ids is not None and len(uniq) and len(excluded_ids):
            # the `-term` negation operator: drop excluded docs BEFORE
            # ranking/truncation (uniq is sorted by construction of
            # np.unique; excluded_ids must be sorted)
            pos = np.searchsorted(excluded_ids, uniq)
            hit = (pos < len(excluded_ids)) & (
                excluded_ids[np.minimum(pos, len(excluded_ids) - 1)] == uniq
            )
            uniq, scores = uniq[~hit], scores[~hit]
        if len(uniq) == 0:
            return []
        if k < len(uniq):
            # select everything >= the k-th score (ties included), then
            # sort that small set with the doc_id tiebreak. Value
            # partition (no index array, no negated copy) finds the k-th
            # largest score.
            kth = np.partition(scores, len(scores) - k)[len(scores) - k]
            cand = np.flatnonzero(scores >= kth)
            order = cand[np.lexsort((uniq[cand], -scores[cand]))][:k]
        else:
            order = np.lexsort((uniq, -scores))[:k]
        return [
            (rank + 1, int(uniq[i]), float(scores[i]))
            for rank, i in enumerate(order)
        ]

    def score_maxscore(
        self, query: str, k: int | None = None
    ) -> list[tuple[int, int, float]]:
        """Top-k with MaxScore pruning (the TAAT cousin of block-max WAND,
        north_star's upper-bound skipping over compressed postings).

        Terms are accumulated in descending order of their maximum
        per-document contribution (cached at posting load). Once the
        remaining terms' upper-bound sum R drops below the current k-th
        partial score θ, no unseen document can enter the top-k, and
        accumulation narrows to the surviving candidate set (binary-search
        intersection against each remaining posting list). Partial scores
        are lower bounds of final scores, so pruning with strict
        ``score + R < θ`` is exact — results are rank- AND score-identical
        to :meth:`score` (asserted in tests).
        """
        cfg = self.cfg
        n = self.stats["num_docs"]
        k = k if k is not None else cfg.default_k
        terms = tokenize_query(query)
        found = self.lookup(terms)
        if not found or n == 0:
            return []
        # sort by upper bound desc; tiebreak term asc for determinism
        items = sorted(
            found.items(),
            key=lambda kv: (-float(kv[1][1].max()) if len(kv[1][1]) else 0.0, kv[0]),
        )
        ubs = np.array(
            [float(c.max()) if len(c) else 0.0 for _, (_, c, _) in items]
        )
        # fully vectorized accumulation: acc_ids (sorted) aligned with
        # acc_sc partial sums; narrowing swaps to candidate-aligned adds
        acc_ids = np.empty(0, dtype=np.int64)
        acc_sc = np.empty(0, dtype=np.float64)
        narrowed = False
        for i, (_t, (ids, contrib, _df)) in enumerate(items):
            if not narrowed:
                if len(acc_ids) == 0:
                    acc_ids = ids.astype(np.int64, copy=True)
                    acc_sc = contrib.astype(np.float64, copy=True)
                else:
                    cat = np.concatenate([acc_ids, ids])
                    sc = np.concatenate([acc_sc, contrib])
                    acc_ids, inv = np.unique(cat, return_inverse=True)
                    merged = np.zeros(len(acc_ids), dtype=np.float64)
                    np.add.at(merged, inv, sc)
                    acc_sc = merged
            else:
                pos = np.searchsorted(ids, acc_ids)
                valid = (pos < len(ids)) & (
                    ids[np.minimum(pos, len(ids) - 1)] == acc_ids
                )
                acc_sc[valid] += contrib[pos[valid]]
            remaining = float(ubs[i + 1 :].sum())
            if remaining == 0.0:
                break
            if len(acc_ids) >= k:
                theta = float(
                    np.partition(acc_sc, len(acc_sc) - k)[len(acc_sc) - k]
                )
                if remaining < theta:
                    keep = acc_sc + remaining >= theta
                    acc_ids = acc_ids[keep]  # stays sorted
                    acc_sc = acc_sc[keep]
                    narrowed = True
        # Re-accumulate survivors in sorted-term order so float summation
        # is bit-identical to the exhaustive scorer (ub-order accumulation
        # differs by ~1 ulp, enough to flip round6 boundaries).
        cand = acc_ids
        exact = np.zeros(len(cand), dtype=np.float64)
        for t in sorted(found):
            ids, contrib, _ = found[t]
            pos = np.searchsorted(ids, cand)
            valid = (pos < len(ids)) & (
                ids[np.minimum(pos, len(ids) - 1)] == cand
            )
            exact[valid] += contrib[pos[valid]]
        order = np.lexsort((cand, -exact))[:k]
        return [
            (r + 1, int(cand[i]), float(exact[i])) for r, i in enumerate(order)
        ]


class ScorerStage:
    """Actor-pool stage: batches of (query_id, query, k) -> top-k rows.

    Index + stats load once per actor in ``__init__`` (reference pattern:
    memoized per-process caches, ``enrichers/github.py:126-137``);
    per-term postings cache is shared across queries hitting the actor.
    """

    def __init__(self, index_path: str, cfg: EngineConfig | None = None,
                 doc_weights: "dict[int, float] | ray.ObjectRef | None" = None):
        self.reader = IndexReader(index_path, cfg)
        # weights may arrive as an object ref (built inside a Ray task —
        # the driver never holds the O(N) map); resolved once per actor
        if isinstance(doc_weights, ray.ObjectRef):
            doc_weights = ray.get(doc_weights)
        self.doc_weights = doc_weights

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids, ranks, docs, scores = [], [], [], []
        for qid, query, k in zip(
            batch["query_id"].to_pylist(),
            batch["query"].to_pylist(),
            batch["k"].to_pylist(),
        ):
            for rank, doc_id, score in self.reader.score(query, k, self.doc_weights):
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


def run_query_set(
    index_path: str,
    queries: list[tuple[int, str, int]] | None = None,
    cfg: EngineConfig | None = None,
    concurrency: int | tuple[int, int] = 2,
    doc_weights: dict[int, float] | None = None,
) -> ray.data.Dataset:
    """Score a query set as a Ray pipeline (queries ds -> scorer actors)."""
    queries = queries or QUERY_SET
    qds = ray.data.from_arrow(
        pa.table(
            {
                "query_id": pa.array([q[0] for q in queries], type=pa.int64()),
                "query": pa.array([q[1] for q in queries], type=pa.string()),
                "k": pa.array([q[2] for q in queries], type=pa.int64()),
            }
        )
    )
    return qds.map_batches(
        ScorerStage,
        fn_constructor_args=(index_path, cfg, doc_weights),
        batch_format="pyarrow",
        batch_size=4,
        concurrency=concurrency,
    )


# ---------------------------------------------------------------------------
# Oracles
# ---------------------------------------------------------------------------


def naive_bm25(
    corpus: pa.Table,
    query: str,
    k: int,
    cfg: EngineConfig | None = None,
    doc_weights: dict[int, float] | None = None,
) -> list[tuple[int, int, float]]:
    """Exhaustive pure-Python/numpy BM25 over a raw corpus table — the
    pytest rank-identity oracle (independent of the index artifacts)."""
    from collections import Counter
    import re

    cfg = cfg or DEFAULT
    token_re = re.compile("[a-z0-9]+")
    docs = corpus["content"].to_pylist()
    ids = corpus["doc_id"].to_pylist()
    toks = [token_re.findall((d or "").lower()) for d in docs]
    n = len(docs)
    dls = [len(t) for t in toks]
    avgdl = sum(dls) / n if n else 0.0
    counters = [Counter(t) for t in toks]
    terms = tokenize_query(query)
    scores: dict[int, float] = {}
    for t in terms:
        df = sum(1 for c in counters if t in c)
        if df == 0:
            continue
        idf = np.log(1.0 + (n - df + 0.5) / (df + 0.5))
        for doc_id, c, dl in zip(ids, counters, dls):
            tf = c.get(t)
            if not tf:
                continue
            tfn = tf * (cfg.k1 + 1.0) / (
                tf + cfg.k1 * (1.0 - cfg.b + cfg.b * dl / avgdl)
            )
            scores[doc_id] = scores.get(doc_id, 0.0) + idf * tfn
    if doc_weights:
        scores = {d: s * doc_weights.get(d, 1.0) for d, s in scores.items()}
    ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return [(r + 1, d, s) for r, (d, s) in enumerate(ranked)]


def _sql_quote(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def bm25_oracle_sql(
    queries: list[tuple[int, str, int]] | None = None,
    cfg: EngineConfig | None = None,
    weighted: bool = False,
) -> str:
    """DuckDB SQL computing the identical BM25 top-k over the identical
    derived corpus — the driver-side correctness oracle. Column names match
    the engine output exactly: (query_id, rank, doc_id, score)."""
    queries = queries or QUERY_SET
    cfg = cfg or DEFAULT
    values = ",\n    ".join(
        f"({qid}, {_sql_quote(q)}, {k})" for qid, q, k in queries
    )
    if weighted:
        # identical weight formula + application order as the engine:
        # w = round6(1 + scale*ln(file_count)); score = sum(contribs) * w
        w_expr = sql_round6(f"1.0 + {cfg.repo_weight_scale} * ln(file_count)")
        weight_ctes = f"""
rstats AS (SELECT repo, count(*)::BIGINT AS file_count FROM corpus GROUP BY repo),
weights AS (SELECT repo, {w_expr} AS w FROM rstats),
docw AS (
  SELECT c.doc_id, w.w FROM corpus c JOIN weights w ON w.repo = c.repo
),"""
        weight_expr = "* dw.w"
        weight_join = "\n  JOIN docw dw ON dw.doc_id = tf.doc_id"
        weight_group = ", dw.w"
    else:
        weight_ctes, weight_expr, weight_join, weight_group = "", "", "", ""
    return f"""
WITH corpus AS ({CORPUS_SQL}),{weight_ctes}
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
  SELECT q.query_id, q.k, tf.doc_id,
         sum(
           ln(1 + ((SELECT n FROM stats) - df.df + 0.5) / (df.df + 0.5))
           * (tf.tf * ({cfg.k1} + 1))
             / (tf.tf + {cfg.k1} * (1 - {cfg.b} + {cfg.b} * dl.dl / (SELECT avgdl FROM stats)))
         ) {weight_expr} AS score
  FROM qterms q
  JOIN tf ON tf.term = q.term
  JOIN df ON df.term = q.term
  JOIN dl ON dl.doc_id = tf.doc_id{weight_join}
  GROUP BY 1, 2, 3{weight_group}
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
