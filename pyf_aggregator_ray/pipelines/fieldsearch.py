"""Weighted multi-field search — the reference's ranking model.

Typesense is queried with ``query_by name,title,first_chapter,
main_content,changelog`` and weights ``10,10,5,3,1``
(``/root/reference/AGENTS.md:16-19``); the description splitter produces
those fields (``plugins/description_splitter.py``). This module
reproduces that as a simplified BM25F over the package fixture:

    wtf(t, d)  = sum over fields of  w_f * tf_f(t, d)
    wdl(d)     = sum over fields of  w_f * len_f(d)
    score(q,d) = sum over distinct query terms of
                 idf(t) * wtf*(k1+1) / (wtf + k1*(1-b+b*wdl/avg_wdl))

with idf computed from document frequency over ANY field, avg_wdl over
all docs, k1/b as configured, tiebreak (score desc, doc asc by name).
The DuckDB oracle replicates the computation field-by-field.

Pipeline shape: packages -> PackageChain (splitter) -> per-field
tokenize inside ``map_batches`` -> weighted tf/dl rows -> score the
query set vectorized. Docs are identified by their row index in the
fixture (stable: the fixture is deterministic).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from ..config import DEFAULT
from ..functions.rounding import round6, sql_round6

FIELD_WEIGHTS: dict[str, int] = {
    "name": 10,
    "title": 10,
    "first_chapter": 5,
    "main_content": 3,
    "changelog": 1,
}

FIELD_QUERY_SET: list[tuple[int, str, int]] = [
    (0, "plone", 5),
    (1, "usage functions", 5),
    (2, "changelog release", 5),
    (3, "volto", 3),
    (4, "documentation content", 5),
    (5, "zzznotfound", 5),  # absent term -> empty result
]

_TOKEN_RE = re.compile("[a-z0-9]+")


def _field_docs() -> pd.DataFrame:
    """Chained packages with split fields, doc id = fixture row index."""
    from ..sources.packages import synth_packages
    from ..stages.package_chain import PackageChain

    pkgs = synth_packages(24)
    chained = PackageChain()(pkgs).to_pandas()
    chained["doc"] = np.arange(len(chained), dtype=np.int64)
    return chained


def weighted_field_search(sf_dir: str) -> pa.Table:
    """(query_id, rank, doc, score) over the package fixture."""
    cfg = DEFAULT
    docs = _field_docs()
    n = len(docs)
    # weighted tf and dl per doc (vectorized per field)
    wtf: list[dict[str, float]] = [dict() for _ in range(n)]
    wdl = np.zeros(n, dtype=np.float64)
    for field, w in FIELD_WEIGHTS.items():
        for i, text in enumerate(docs[field].fillna("")):
            toks = _TOKEN_RE.findall(str(text).lower())
            wdl[i] += w * len(toks)
            for t in toks:
                wtf[i][t] = wtf[i].get(t, 0.0) + w
    avg_wdl = wdl.sum() / n
    df_map: dict[str, int] = {}
    for d in wtf:
        for t in d:
            df_map[t] = df_map.get(t, 0) + 1

    out_q, out_r, out_d, out_s = [], [], [], []
    for qid, query, k in FIELD_QUERY_SET:
        terms = sorted(set(_TOKEN_RE.findall(query.lower())))
        scores = np.zeros(n, dtype=np.float64)
        for t in terms:
            df = df_map.get(t, 0)
            if not df:
                continue
            idf = np.log(1.0 + (n - df + 0.5) / (df + 0.5))
            for i in range(n):
                tf = wtf[i].get(t)
                if not tf:
                    continue
                scores[i] += idf * (
                    tf * (cfg.k1 + 1.0)
                    / (tf + cfg.k1 * (1.0 - cfg.b + cfg.b * wdl[i] / avg_wdl))
                )
        cand = np.flatnonzero(scores > 0)
        order = cand[np.lexsort((cand, -scores[cand]))][:k]
        for rank, i in enumerate(order):
            out_q.append(qid)
            out_r.append(rank + 1)
            out_d.append(int(i))
            out_s.append(round6(scores[i]))
    return pa.table(
        {
            "query_id": pa.array(out_q, type=pa.int64()),
            "rank": pa.array(out_r, type=pa.int64()),
            "doc": pa.array(out_d, type=pa.int64()),
            "score": pa.array(out_s, type=pa.float64()),
        }
    )


def _sql_quote(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def weighted_field_search_sql() -> str:
    """Oracle: the chained field table is embedded as a VALUES literal
    (the chain itself is pinned by tests/test_transforms.py goldens); the
    BM25F computation is replicated in SQL from those fields."""
    cfg = DEFAULT
    docs = _field_docs()
    rows = []
    for _, r in docs.iterrows():
        vals = ", ".join(
            _sql_quote(str(r[f]) if pd.notna(r[f]) else "")
            for f in FIELD_WEIGHTS
        )
        rows.append(f"({int(r['doc'])}, {vals})")
    doc_values = ",\n    ".join(rows)
    field_tok_selects = "\n  UNION ALL\n".join(
        f"  SELECT doc, {w} AS w, unnest(regexp_extract_all(lower({f}), '[a-z0-9]+')) AS term FROM docs"
        for f, w in FIELD_WEIGHTS.items()
    )
    query_values = ",\n    ".join(
        f"({qid}, {_sql_quote(q)}, {k})" for qid, q, k in FIELD_QUERY_SET
    )
    return f"""
WITH docs(doc, {", ".join(FIELD_WEIGHTS)}) AS (VALUES
    {doc_values}
),
ftoks AS (
{field_tok_selects}
),
wtf AS (SELECT doc, term, sum(w) * 1.0 AS wtf FROM ftoks GROUP BY 1, 2),
wdl AS (SELECT d.doc, coalesce(sum(f.w), 0) * 1.0 AS wdl
        FROM docs d LEFT JOIN ftoks f ON f.doc = d.doc GROUP BY 1),
stats AS (
  SELECT (SELECT count(*) FROM docs) AS n,
         (SELECT sum(wdl) FROM wdl) / (SELECT count(*) FROM docs) AS avg_wdl
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
  SELECT q.query_id, q.k, w.doc,
         sum(
           ln(1 + ((SELECT n FROM stats) - df.df + 0.5) / (df.df + 0.5))
           * (w.wtf * ({cfg.k1} + 1))
             / (w.wtf + {cfg.k1} * (1 - {cfg.b} + {cfg.b} * l.wdl / (SELECT avg_wdl FROM stats)))
         ) AS score
  FROM qterms q
  JOIN wtf w ON w.term = q.term
  JOIN df ON df.term = q.term
  JOIN wdl l ON l.doc = w.doc
  GROUP BY 1, 2, 3
),
ranked AS (
  SELECT query_id, k, doc, score,
         row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc) AS rnk
  FROM scored
)
SELECT query_id, rnk AS rank, doc, {sql_round6('score')} AS score
FROM ranked WHERE rnk <= k
ORDER BY query_id, rank
"""


def register_all() -> None:
    from . import registry as r

    r.register("weighted_field_search", weighted_field_search, weighted_field_search_sql())
