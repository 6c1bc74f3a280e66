"""Weighted multi-field search — the reference's flagship ranking model,
as a distributed Ray Data pipeline over the corpus-scale ``documents``
table.

Typesense is queried with ``query_by name,title,first_chapter,
main_content,changelog`` and weights ``10,10,5,3,1``
(``/root/reference/AGENTS.md:16-19``); the description splitter produces
those fields (``/root/reference/src/pyf/aggregator/plugins/
description_splitter.py:129-291``). This module reproduces that as BM25F:

    wtf(t, d)  = sum over fields of  w_f * tf_f(t, d)
    wdl(d)     = sum over fields of  w_f * len_f(d)
    score(q,d) = sum over distinct query terms of
                 idf(t) * wtf*(k1+1) / (wtf + k1*(1-b+b*wdl/avg_wdl))

with idf = ln(1 + (n - df + 0.5)/(df + 0.5)) over ANY-field document
frequency, tiebreak (score desc, doc_id asc).

Pipeline shape (every stage a Dataset transform; nothing O(N) lands on
the driver):

  read_parquet(documents)
    -> map_batches(FieldDocStage)    # build per-doc markdown, run the
                                     # real PackageChain splitter (actor
                                     # pool; chain composed in __init__)
    -> map_batches(field_tf_batch)   # per-field Arrow-vectorized
                                     # tokenize -> (doc, term, wtf, wdl)
    -> [corpus stats via grouped aggregates]
    -> filter to query terms -> per-row BM25F contributions
    -> groupby(query_id, doc).sum -> per-query top-k (map_groups)

Driver-side state is bounded: per-query-term df (a handful of rows),
two corpus scalars (n, avg_wdl), and the final top-k rows.

The DuckDB oracle recomputes the split fields *independently* from the
parquet table (the markdown construction below slices the document's
token stream at fixed word offsets, so each field's token list is
expressible as a list-slice in SQL — no engine-computed literals).

The query set uses at most TWO terms per query on purpose: two-float
addition is commutative in IEEE-754, so the engine's unordered grouped
sum and the oracle's SQL SUM agree bit-for-bit without imposing a
summation order.
"""

from __future__ import annotations

import math
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ..config import DEFAULT
from ..functions.rounding import round6, sql_round6
from ..functions.tokenizer import doc_lengths, term_frequencies, tokenize_column

FIELD_WEIGHTS: dict[str, int] = {
    "name": 10,
    "title": 10,
    "first_chapter": 5,
    "main_content": 3,
    "changelog": 1,
}

# word offsets splitting each document's token stream into markdown
# sections (first_chapter | main_content | changelog bodies)
PART_A_WORDS = 8
PART_B_END = 24

FIELD_QUERY_SET: list[tuple[int, str, int]] = [
    (0, "table", 5),
    (1, "query spark", 5),
    (2, "customer window", 5),
    (3, "doc 42", 3),
    (4, "changelog merge", 5),
    (5, "zzznotfound", 5),  # absent term -> empty result
]

_TOKEN_RE = re.compile("[a-z0-9]+")


def doc_markdown(doc_id: int, words: list[str]) -> str:
    """Deterministic markdown document whose split fields are word-slices
    of the token stream (so the oracle can recompute them in SQL).

    Heading layout keeps line indices stable whether or not a part is
    empty, and the splitter yields:
      title         = 'Doc {id}'
      first_chapter = '# Doc {id}' + words[:8]
      main_content  = '## Usage'   + words[8:24]
      changelog     = '## Changelog' + words[24:]
    """
    part_a = " ".join(words[:PART_A_WORDS])
    part_b = " ".join(words[PART_A_WORDS:PART_B_END])
    part_c = " ".join(words[PART_B_END:])
    return (
        f"# Doc {doc_id}\n\n{part_a}\n\n## Usage\n\n{part_b}"
        f"\n\n## Changelog\n\n{part_c}"
    )


class FieldDocStage:
    """Actor-pool stage: documents batch -> chained docs with split fields.

    The real plugin chain (``stages.package_chain.PackageChain``) is
    composed once per actor (reference ST1 pattern) and applied per
    batch; the chain is SLICED to the plugins whose outputs BM25F
    consumes (clean + description_splitter) — running health scoring /
    repo extraction / version slicing per corpus document would be pure
    wasted CPU on the hottest stage (their outputs are dropped by the
    projection below).
    """

    def __init__(self) -> None:
        from ..stages.package_chain import DEFAULT_CHAIN, PackageChain

        wanted = {"clean", "description_splitter"}
        self.chain = PackageChain(
            [(name, fn) for name, fn in DEFAULT_CHAIN if name in wanted]
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        toks = tokenize_column(batch["text"])
        ids = batch["doc_id"].to_pylist()
        docs = []
        for doc_id, words in zip(ids, toks.to_pylist()):
            docs.append(
                {
                    "doc_id": doc_id,
                    "name": f"doc-{doc_id}",
                    "version": "1.0.0",
                    "summary": "",
                    "description": doc_markdown(doc_id, words),
                    "registry": "synthetic",
                }
            )
        chained = self.chain(pa.Table.from_pylist(docs))
        return chained.select(
            ["doc_id", "name", "title", "first_chapter", "main_content", "changelog"]
        )


def field_tf_batch(batch: pa.Table) -> pa.Table:
    """Chained-field batch -> (doc, term, wtf, wdl) rows, Arrow-vectorized.

    wtf/wdl are integer-valued float64 (exact below 2^53), so the grouped
    float sums here and the oracle's integer SUM(w)*1.0 agree exactly.
    """
    ids_np = np.asarray(batch["doc_id"].to_numpy(zero_copy_only=False), dtype=np.int64)
    wdl = np.zeros(len(ids_np), dtype=np.float64)
    parts = []
    for field, w in FIELD_WEIGHTS.items():
        toks = tokenize_column(batch[field])
        wdl += float(w) * np.asarray(
            doc_lengths(toks).to_numpy(zero_copy_only=False), dtype=np.float64
        )
        tf = term_frequencies(toks, ids_np)
        parts.append(
            pa.table(
                {
                    "doc": tf["doc_id"],
                    "term": tf["term"],
                    "wtf": pc.multiply(
                        pc.cast(tf["tf"], pa.float64()), pa.scalar(float(w))
                    ),
                }
            )
        )
    agg = (
        pa.concat_tables(parts)
        .group_by(["doc", "term"])
        .aggregate([("wtf", "sum")])
    )
    # attach each doc's wdl to its term rows by position lookup
    order = np.argsort(ids_np, kind="stable")
    row_docs = np.asarray(agg["doc"].to_numpy(zero_copy_only=False), dtype=np.int64)
    pos = order[np.searchsorted(ids_np[order], row_docs)]
    return pa.table(
        {
            "doc": agg["doc"],
            "term": agg["term"],
            "wtf": agg["wtf_sum"],
            "wdl": pa.array(wdl[pos], type=pa.float64()),
        }
    )


def field_tf_rows(docs: ray.data.Dataset) -> ray.data.Dataset:
    """documents Dataset -> weighted per-(doc, term) tf rows Dataset."""
    return docs.map_batches(
        FieldDocStage, batch_format="pyarrow", concurrency=(1, 4)
    ).map_batches(field_tf_batch, batch_format="pyarrow")


def score_queries(
    tf: ray.data.Dataset,
    queryset: list[tuple[int, str, int]],
    k1: float,
    b: float,
) -> pa.Table:
    """Score a query set over weighted tf rows; returns the final tiny
    (query_id, rank, doc_id, score) table (the only driver-side result)."""
    from ray.data.aggregate import Count, Max, Sum

    tf = tf.materialize()  # reused by stats / df / scoring branches

    _empty = pa.schema(
        [("query_id", pa.int64()), ("rank", pa.int64()),
         ("doc_id", pa.int64()), ("score", pa.float64())]
    )

    # corpus stats: two scalars on the driver
    doclens = tf.groupby("doc").aggregate(Max("wdl"))
    stats = doclens.aggregate(Sum("max(wdl)"), Count())
    n = int(stats["count()"] or 0)
    if n == 0 or stats["sum(max(wdl))"] is None:
        return _empty.empty_table()
    avg_wdl = float(stats["sum(max(wdl))"]) / n

    term_queries: dict[str, list[tuple[int, int]]] = {}
    for qid, query, k in queryset:
        for t in set(_TOKEN_RE.findall(query.lower())):
            term_queries.setdefault(t, []).append((qid, k))
    qterm_arr = pa.array(sorted(term_queries), type=pa.string())

    def only_query_terms(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_in(t["term"], value_set=qterm_arr))

    qtf = tf.map_batches(only_query_terms, batch_format="pyarrow").materialize()

    # df for the handful of query terms (tiny driver-side dict)
    df_map: dict[str, int] = {}
    for row in qtf.groupby("term").aggregate(Count()).take_all():
        df_map[row["term"]] = int(row["count()"])
    idf_map = {
        t: math.log(1.0 + (n - df + 0.5) / (df + 0.5)) for t, df in df_map.items()
    }

    def contrib_batch(t: pa.Table) -> pa.Table:
        terms = t["term"].to_pylist()
        wtf = np.asarray(t["wtf"].to_numpy(zero_copy_only=False), dtype=np.float64)
        wdl = np.asarray(t["wdl"].to_numpy(zero_copy_only=False), dtype=np.float64)
        docs_ = np.asarray(t["doc"].to_numpy(zero_copy_only=False), dtype=np.int64)
        idf = np.array([idf_map[x] for x in terms], dtype=np.float64)
        contrib = idf * (wtf * (k1 + 1.0)) / (wtf + k1 * (1.0 - b + b * wdl / avg_wdl))
        out_q, out_d, out_c = [], [], []
        for i, term in enumerate(terms):
            for qid, _k in term_queries[term]:
                out_q.append(qid)
                out_d.append(int(docs_[i]))
                out_c.append(float(contrib[i]))
        return pa.table(
            {
                "query_id": pa.array(out_q, type=pa.int64()),
                "doc_id": pa.array(out_d, type=pa.int64()),
                "contrib": pa.array(out_c, type=pa.float64()),
            }
        )

    scores = (
        qtf.map_batches(contrib_batch, batch_format="pyarrow")
        .groupby(["query_id", "doc_id"])
        .aggregate(Sum("contrib"))
    )

    k_of_query = {qid: k for qid, _q, k in queryset}

    def topk_of_query(g):
        # pandas group: one query's scored docs
        qid = int(g["query_id"].iloc[0])
        k = k_of_query[qid]
        g = g.sort_values(
            ["sum(contrib)", "doc_id"], ascending=[False, True]
        ).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    top = scores.groupby("query_id").map_groups(topk_of_query)

    rows = sorted(
        ((int(r["query_id"]), int(r["rank"]), int(r["doc_id"]), float(r["sum(contrib)"]))
         for r in top.take_all())
    )
    return pa.table(
        {
            "query_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "rank": pa.array([r[1] for r in rows], type=pa.int64()),
            "doc_id": pa.array([r[2] for r in rows], type=pa.int64()),
            "score": pa.array([round6(r[3]) for r in rows], type=pa.float64()),
        }
    )


def weighted_field_search(sf_dir: str) -> pa.Table:
    """(query_id, rank, doc_id, score) — BM25F over the documents table."""
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    tf = field_tf_rows(docs)
    return score_queries(tf, FIELD_QUERY_SET, DEFAULT.k1, DEFAULT.b)


def _sql_quote(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def weighted_field_search_sql() -> str:
    """Independent oracle: recompute the split fields as token-list slices
    of the documents table (see doc_markdown for why the slices are the
    fields) and replicate BM25F in SQL."""
    cfg = DEFAULT
    a, bnd = PART_A_WORDS, PART_B_END
    query_values = ",\n    ".join(
        f"({qid}, {_sql_quote(q)}, {k})" for qid, q, k in FIELD_QUERY_SET
    )
    return f"""
WITH words AS (
  SELECT doc_id,
         regexp_extract_all(lower(coalesce(text, '')), '[a-z0-9]+') AS ws
  FROM documents
),
ftoks AS (
  SELECT doc_id, 10 AS w, unnest(['doc', doc_id::VARCHAR]) AS term FROM words
  UNION ALL
  SELECT doc_id, 10 AS w, unnest(['doc', doc_id::VARCHAR]) AS term FROM words
  UNION ALL
  SELECT doc_id, 5 AS w,
         unnest(list_concat(['doc', doc_id::VARCHAR], ws[1:{a}])) AS term FROM words
  UNION ALL
  SELECT doc_id, 3 AS w,
         unnest(list_concat(['usage'], ws[{a + 1}:{bnd}])) AS term FROM words
  UNION ALL
  SELECT doc_id, 1 AS w,
         unnest(list_concat(['changelog'], ws[{bnd + 1}:])) AS term FROM words
),
wtf AS (SELECT doc_id, term, sum(w) * 1.0 AS wtf FROM ftoks GROUP BY 1, 2),
wdl AS (SELECT doc_id, sum(w) * 1.0 AS wdl FROM ftoks GROUP BY 1),
stats AS (
  SELECT (SELECT count(*) FROM documents) AS n,
         (SELECT sum(wdl) FROM wdl) / (SELECT count(*) FROM documents) AS avg_wdl
),
df AS (SELECT term, count(*)::BIGINT AS df FROM wtf GROUP BY 1),
queries(query_id, query, k) AS (VALUES
    {query_values}
),
qterms AS (
  SELECT DISTINCT query_id, k,
         unnest(regexp_extract_all(lower(query), '[a-z0-9]+')) AS term
  FROM queries
),
scored AS (
  SELECT q.query_id, q.k, w.doc_id,
         sum(
           ln(1 + ((SELECT n FROM stats) - df.df + 0.5) / (df.df + 0.5))
           * (w.wtf * ({cfg.k1} + 1))
             / (w.wtf + {cfg.k1} * (1 - {cfg.b} + {cfg.b} * l.wdl / (SELECT avg_wdl FROM stats)))
         ) AS score
  FROM qterms q
  JOIN wtf w ON w.term = q.term
  JOIN df ON df.term = q.term
  JOIN wdl l ON l.doc_id = w.doc_id
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


def register_all() -> None:
    from . import registry as r

    r.register("weighted_field_search", weighted_field_search, weighted_field_search_sql())
