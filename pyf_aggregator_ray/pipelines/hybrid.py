"""Hybrid (keyword + vector) search with reciprocal-rank fusion.

The reference's search engine exposes hybrid search: a text query ranked
by BM25 over the inverted index fused with a dense-vector query ranked
by cosine similarity, combined by reciprocal-rank fusion (RRF) — the
standard fusion rule ``score(d) = Σ_lists 1 / (K + rank_list(d))``
(Cormack/Clarke/Buettcher, SIGIR'09), with docs absent from a list
contributing nothing. Reference surface: the engine's ``query_by`` may
mix text and vector fields in one search (the same retrieval endpoint as
``/root/reference/src/pyf/aggregator/db.py:377-426``).

Semantics pinned here (and replicated in the SQL oracle):

* both lists are truncated at ``FUSE_DEPTH`` before fusion (retrieval
  depth, what real engines do — RRF over full corpus-length lists would
  make every query O(N));
* text rank: BM25 over the built index, tiebreak score desc / doc_id
  asc (identical to ``bm25_topk``);
* vector rank: cosine against the query embedding, round6 before
  ranking, tiebreak cosine desc / vec_id asc (identical to
  ``ann_topk``); embeddings align with the corpus by vec_id == doc_id;
* fused ordering: round6(rrf) desc, doc_id asc, top-k per query.

Scale shape (100 TB): the text list is served by the distributed index
scorers (per-actor pushdown posting reads), the vector list by the
per-batch partial-top-k + tiny-merge of ``brute_force_topk`` (the
LSH/IVF variants slot in unchanged — only the candidate generator
differs). Fusion itself touches Q × 2·FUSE_DEPTH rows — independent of
corpus size — so it runs on the driver by design, not as a shortcut.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from ..config import DEFAULT, EngineConfig
from ..functions.rounding import round6, sql_round6
from ..sources.corpus import CORPUS_SQL
from ..stages import ann as ann_stage
from . import query as q

# (query_id, text query, query vec_id, k) — covers: overlapping lists
# (text hits that are also vector-near), a hot text term, a text query
# with zero hits (pure-vector ranking), a 3-token phrase-ish query, and
# k close to FUSE_DEPTH.
HYBRID_QUERIES: list[tuple[int, str, int, int]] = [
    (0, "merge sort", 0, 10),
    (1, "the", 17, 10),
    (2, "nonexistentterm42", 5, 8),
    (3, "customer value analysis", 123, 5),
    (4, "spark window", 42, 15),
]

FUSE_DEPTH = 20  # per-list retrieval depth fed into fusion
RRF_K = 60  # the standard RRF dampening constant


class HybridTextStage:
    """Actor-pool stage: (query_id, query) -> the query's BM25 list at
    FUSE_DEPTH, ``(query_id, doc_id, text_rank)``. Index handle loads
    once per actor; scoring is the same exhaustive vectorized TAAT as
    ``bm25_topk`` (ranks therefore agree with its green oracle)."""

    def __init__(self, index_path: str, cfg: EngineConfig | None = None):
        self.reader = q.IndexReader(index_path, cfg)

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids, docs, ranks = [], [], []
        for qid, query in zip(
            batch["query_id"].to_pylist(), batch["query"].to_pylist()
        ):
            for rank, doc_id, _score in self.reader.score(query, FUSE_DEPTH):
                qids.append(qid)
                docs.append(doc_id)
                ranks.append(rank)
        return pa.table(
            {
                "query_id": pa.array(qids, type=pa.int64()),
                "doc_id": pa.array(docs, type=pa.int64()),
                "text_rank": pa.array(ranks, type=pa.int64()),
            }
        )


def _rrf_fuse(
    text_tbl: pa.Table,
    vec_tbl: pa.Table,
    queries: list[tuple[int, str, int, int]],
) -> pa.Table:
    """Driver-side fusion of the two per-query rank lists (≤ 2·FUSE_DEPTH
    rows per query). Ordering: round6(rrf) desc, doc_id asc, top-k."""
    tmap: dict[int, dict[int, int]] = {}
    for qid, doc, r in zip(
        text_tbl["query_id"].to_pylist(),
        text_tbl["doc_id"].to_pylist(),
        text_tbl["text_rank"].to_pylist(),
    ):
        tmap.setdefault(qid, {})[doc] = r
    vmap: dict[int, dict[int, int]] = {}
    for qid, doc, r in zip(
        vec_tbl["query_id"].to_pylist(),
        vec_tbl["doc_id"].to_pylist(),
        vec_tbl["vec_rank"].to_pylist(),
    ):
        vmap.setdefault(qid, {})[doc] = r

    out = {
        "query_id": [],
        "rank": [],
        "doc_id": [],
        "score": [],
        "text_rank": [],
        "vec_rank": [],
    }
    for qid, _query, _qvec, k in queries:
        t = tmap.get(qid, {})
        v = vmap.get(qid, {})
        docs = np.array(sorted(set(t) | set(v)), dtype=np.int64)
        if len(docs) == 0:
            continue
        tr = np.array([t.get(int(d), 0) for d in docs], dtype=np.int64)
        vr = np.array([v.get(int(d), 0) for d in docs], dtype=np.int64)
        fused = np.where(tr > 0, 1.0 / (RRF_K + tr), 0.0) + np.where(
            vr > 0, 1.0 / (RRF_K + vr), 0.0
        )
        fused_r = round6(fused)
        order = np.lexsort((docs, -fused_r))[:k]
        out["query_id"].extend([qid] * len(order))
        out["rank"].extend(range(1, len(order) + 1))
        out["doc_id"].extend(docs[order].tolist())
        out["score"].extend(fused_r[order].tolist())
        out["text_rank"].extend(tr[order].tolist())
        out["vec_rank"].extend(vr[order].tolist())
    return pa.table(
        {
            "query_id": pa.array(out["query_id"], type=pa.int64()),
            "rank": pa.array(out["rank"], type=pa.int64()),
            "doc_id": pa.array(out["doc_id"], type=pa.int64()),
            "score": pa.array(out["score"], type=pa.float64()),
            "text_rank": pa.array(out["text_rank"], type=pa.int64()),
            "vec_rank": pa.array(out["vec_rank"], type=pa.int64()),
        }
    )


def hybrid_search(sf_dir: str, vector_backend: str = "brute") -> pa.Table:
    """``vector_backend``: 'brute' (exact — the contract/oracle path) or
    'lsh' (hyperplane-bucketed candidates — the 10^9-vector scale path;
    same fusion, only the candidate generator differs; recall floor
    pinned in tests/test_search_features.py)."""
    from .registry import ensure_index

    root = ensure_index(sf_dir)

    # text side at fusion depth through the doc-id-SHARDED scorer (ranks
    # identical to the exhaustive path — the sharded merge is the same
    # (score desc, doc_id asc) order bm25_topk's oracle verifies)
    from . import shardquery as sq

    text_ranked = sq.run_query_set_sharded(
        root, queries=[(p[0], p[1], FUSE_DEPTH) for p in HYBRID_QUERIES]
    )
    text_tbl = pa.concat_tables(
        [
            t.select(["query_id", "doc_id", "rank"]).rename_columns(
                ["query_id", "doc_id", "text_rank"]
            )
            for t in (ray.get(r) for r in text_ranked.to_arrow_refs())
            if t.num_rows
        ]
        or [
            pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    "doc_id": pa.array([], pa.int64()),
                    "text_rank": pa.array([], pa.int64()),
                }
            )
        ]
    )

    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")
    vec_ids = sorted({p[2] for p in HYBRID_QUERIES})
    if vector_backend == "lsh":
        # fewer planes -> larger buckets: the candidate pool per probe set
        # must comfortably exceed FUSE_DEPTH for usable recall
        ann = ann_stage.lsh_bucketed_topk(emb, vec_ids, FUSE_DEPTH, num_planes=4)
    else:
        ann = ann_stage.brute_force_topk(emb, vec_ids, FUSE_DEPTH)
    # map each query's vec_id back to its query_id (vec ids may be shared)
    rows = {
        "query_id": [],
        "doc_id": [],
        "vec_rank": [],
    }
    per_vec: dict[int, list[tuple[int, int]]] = {}
    for qvid, rank, vid in zip(
        ann["query_vec_id"].to_pylist(),
        ann["rank"].to_pylist(),
        ann["vec_id"].to_pylist(),
    ):
        per_vec.setdefault(qvid, []).append((rank, vid))
    for qid, _query, qvec, _k in HYBRID_QUERIES:
        for rank, vid in per_vec.get(qvec, []):
            rows["query_id"].append(qid)
            rows["doc_id"].append(vid)
            rows["vec_rank"].append(rank)
    vec_tbl = pa.table(
        {
            "query_id": pa.array(rows["query_id"], type=pa.int64()),
            "doc_id": pa.array(rows["doc_id"], type=pa.int64()),
            "vec_rank": pa.array(rows["vec_rank"], type=pa.int64()),
        }
    )

    return _rrf_fuse(text_tbl, vec_tbl, HYBRID_QUERIES)


def hybrid_search_sql(
    queries: list[tuple[int, str, int, int]] | None = None,
    cfg: EngineConfig | None = None,
) -> str:
    """Oracle: BM25 CTE (identical formula to the green ``bm25_topk``
    family) ranked at FUSE_DEPTH, cosine CTE (identical to ``ann_topk``,
    round6 before ranking) ranked at FUSE_DEPTH, full-outer-joined per
    query, RRF-summed, re-ranked by round6(rrf) desc / doc_id asc."""
    queries = queries or HYBRID_QUERIES
    cfg = cfg or DEFAULT
    values = ",\n    ".join(
        f"({qid}, {q._sql_quote(text)}, {qvec}, {k})"
        for qid, text, qvec, k in queries
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
queries(query_id, query, qvec, k) AS (VALUES
    {values}
),
qterms AS (
  SELECT DISTINCT query_id,
         unnest(regexp_extract_all(lower(query), '[a-z0-9]+')) AS term
  FROM queries
),
tscored AS (
  SELECT q.query_id, tf.doc_id,
         sum(
           ln(1 + ((SELECT n FROM stats) - df.df + 0.5) / (df.df + 0.5))
           * (tf.tf * ({cfg.k1} + 1))
             / (tf.tf + {cfg.k1} * (1 - {cfg.b} + {cfg.b} * dl.dl / (SELECT avgdl FROM stats)))
         ) AS score
  FROM qterms q
  JOIN tf ON tf.term = q.term
  JOIN df ON df.term = q.term
  JOIN dl ON dl.doc_id = tf.doc_id
  GROUP BY 1, 2
),
tlist AS (
  SELECT query_id, doc_id, trank FROM (
    SELECT query_id, doc_id,
           row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id) AS trank
    FROM tscored
  ) WHERE trank <= {FUSE_DEPTH}
),
qv AS (
  SELECT q.query_id, e.embedding
  FROM queries q JOIN embeddings e ON e.vec_id = q.qvec
),
vscored AS (
  SELECT qv.query_id, e.vec_id AS doc_id,
         {sql_round6('list_cosine_similarity(qv.embedding::DOUBLE[], e.embedding::DOUBLE[])')} AS cosine
  FROM qv CROSS JOIN embeddings e
),
vlist AS (
  SELECT query_id, doc_id, vrank FROM (
    SELECT query_id, doc_id,
           row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, doc_id) AS vrank
    FROM vscored
  ) WHERE vrank <= {FUSE_DEPTH}
),
fused AS (
  SELECT coalesce(t.query_id, v.query_id) AS query_id,
         coalesce(t.doc_id, v.doc_id) AS doc_id,
         coalesce(1.0 / ({RRF_K} + t.trank), 0.0)
           + coalesce(1.0 / ({RRF_K} + v.vrank), 0.0) AS rrf,
         coalesce(t.trank, 0)::BIGINT AS text_rank,
         coalesce(v.vrank, 0)::BIGINT AS vec_rank
  FROM tlist t FULL OUTER JOIN vlist v
    ON t.query_id = v.query_id AND t.doc_id = v.doc_id
),
ranked AS (
  SELECT f.query_id, f.doc_id, {sql_round6('f.rrf')} AS score,
         f.text_rank, f.vec_rank, qq.k,
         row_number() OVER (
           PARTITION BY f.query_id
           ORDER BY {sql_round6('f.rrf')} DESC, f.doc_id
         ) AS rank
  FROM fused f JOIN queries qq ON qq.query_id = f.query_id
)
SELECT query_id, rank::BIGINT AS rank, doc_id, score, text_rank, vec_rank
FROM ranked WHERE rank <= k
ORDER BY query_id, rank
"""


HYBRID_LSH_PLANES = 4  # fewer planes -> candidate pool >> FUSE_DEPTH


def hybrid_search_lsh(sf_dir: str) -> pa.Table:
    """The scale-path variant as its own contract entry: LSH-bucketed
    vector candidates (seeded planes embedded in the SQL oracle, which
    replicates bucket + hamming-1 probing exactly) fused with the same
    RRF rule."""
    return hybrid_search(sf_dir, vector_backend="lsh")


def _hybrid_plane_values() -> str:
    planes = ann_stage.lsh_planes(HYBRID_LSH_PLANES, 64)
    return ",\n    ".join(
        f"({p}, {j + 1}, {planes[p, j]!r})"
        for p in range(HYBRID_LSH_PLANES)
        for j in range(64)
    )


def hybrid_search_lsh_sql(
    queries: list[tuple[int, str, int, int]] | None = None,
    cfg: EngineConfig | None = None,
) -> str:
    """Oracle: the brute oracle's text/fusion CTEs with the vector list
    replaced by the LSH-bucketed ranking (same plane literals and
    probe rule as the green ``ann_topk_lsh`` oracle)."""
    queries = queries or HYBRID_QUERIES
    cfg = cfg or DEFAULT
    values = ",\n    ".join(
        f"({qid}, {q._sql_quote(text)}, {qvec}, {k})"
        for qid, text, qvec, k in queries
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
queries(query_id, query, qvec, k) AS (VALUES
    {values}
),
qterms AS (
  SELECT DISTINCT query_id,
         unnest(regexp_extract_all(lower(query), '[a-z0-9]+')) AS term
  FROM queries
),
tscored AS (
  SELECT q.query_id, tf.doc_id,
         sum(
           ln(1 + ((SELECT n FROM stats) - df.df + 0.5) / (df.df + 0.5))
           * (tf.tf * ({cfg.k1} + 1))
             / (tf.tf + {cfg.k1} * (1 - {cfg.b} + {cfg.b} * dl.dl / (SELECT avgdl FROM stats)))
         ) AS score
  FROM qterms q
  JOIN tf ON tf.term = q.term
  JOIN df ON df.term = q.term
  JOIN dl ON dl.doc_id = tf.doc_id
  GROUP BY 1, 2
),
tlist AS (
  SELECT query_id, doc_id, trank FROM (
    SELECT query_id, doc_id,
           row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id) AS trank
    FROM tscored
  ) WHERE trank <= {FUSE_DEPTH}
),
planes(p, j, w) AS (VALUES
    {_hybrid_plane_values()}
),
comp AS (
  SELECT vec_id,
         generate_subscripts(embedding, 1) AS j,
         unnest(embedding)::DOUBLE AS x
  FROM embeddings
),
dots AS (
  SELECT c.vec_id, pl.p, sum(c.x * pl.w) AS dot
  FROM comp c JOIN planes pl ON pl.j = c.j
  GROUP BY 1, 2
),
sigs AS (
  SELECT vec_id,
         sum(CASE WHEN dot > 0 THEN (1::BIGINT << p) ELSE 0 END)::BIGINT AS bucket
  FROM dots GROUP BY 1
),
qsig AS (
  SELECT q.query_id, s.bucket AS qb
  FROM queries q JOIN sigs s ON s.vec_id = q.qvec
),
probe AS (
  SELECT query_id, qb AS pb FROM qsig
  UNION
  SELECT query_id, xor(qb, (1::BIGINT << i.i)) AS pb
  FROM qsig CROSS JOIN (SELECT unnest(range({HYBRID_LSH_PLANES})) AS i) i
),
vcand AS (
  SELECT DISTINCT p.query_id, s.vec_id FROM probe p JOIN sigs s ON s.bucket = p.pb
),
vscored AS (
  SELECT c.query_id, c.vec_id AS doc_id,
         {sql_round6('list_cosine_similarity(qe.embedding::DOUBLE[], e.embedding::DOUBLE[])')} AS cosine
  FROM vcand c
  JOIN queries qq ON qq.query_id = c.query_id
  JOIN embeddings qe ON qe.vec_id = qq.qvec
  JOIN embeddings e ON e.vec_id = c.vec_id
),
vlist AS (
  SELECT query_id, doc_id, vrank FROM (
    SELECT query_id, doc_id,
           row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, doc_id) AS vrank
    FROM vscored
  ) WHERE vrank <= {FUSE_DEPTH}
),
fused AS (
  SELECT coalesce(t.query_id, v.query_id) AS query_id,
         coalesce(t.doc_id, v.doc_id) AS doc_id,
         coalesce(1.0 / ({RRF_K} + t.trank), 0.0)
           + coalesce(1.0 / ({RRF_K} + v.vrank), 0.0) AS rrf,
         coalesce(t.trank, 0)::BIGINT AS text_rank,
         coalesce(v.vrank, 0)::BIGINT AS vec_rank
  FROM tlist t FULL OUTER JOIN vlist v
    ON t.query_id = v.query_id AND t.doc_id = v.doc_id
),
ranked AS (
  SELECT f.query_id, f.doc_id, {sql_round6('f.rrf')} AS score,
         f.text_rank, f.vec_rank, qq.k,
         row_number() OVER (
           PARTITION BY f.query_id
           ORDER BY {sql_round6('f.rrf')} DESC, f.doc_id
         ) AS rank
  FROM fused f JOIN queries qq ON qq.query_id = f.query_id
)
SELECT query_id, rank::BIGINT AS rank, doc_id, score, text_rank, vec_rank
FROM ranked WHERE rank <= k
ORDER BY query_id, rank
"""


def hybrid_search_both(sf_dir: str) -> pa.Table:
    """ONE parameterized entry for the hybrid family (registry
    consolidation): the exact brute-force vector backend and the LSH
    scale backend, distinguished by the ``backend`` column — one driver
    row verifies RRF fusion AND both candidate generators."""

    def tag(t: pa.Table, backend: str) -> pa.Table:
        return t.append_column(
            "backend", pa.array([backend] * t.num_rows, type=pa.string())
        )

    return pa.concat_tables(
        [
            tag(hybrid_search(sf_dir, vector_backend="brute"), "brute"),
            tag(hybrid_search_lsh(sf_dir), "lsh"),
        ]
    )


def hybrid_search_both_sql() -> str:
    return f"""
SELECT 'brute' AS backend, * FROM ({hybrid_search_sql()})
UNION ALL
SELECT 'lsh' AS backend, * FROM ({hybrid_search_lsh_sql()})
ORDER BY backend, query_id, rank
"""


def register_all() -> None:
    from . import registry as r

    r.register("hybrid_search", hybrid_search_both, hybrid_search_both_sql())
