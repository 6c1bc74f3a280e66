"""Corpus curation: the composed training-data cleaning pipeline.

The flagship "curate a raw corpus" flow a large-scale training-data
engine runs before tokenization — exact dedup, MinHash near-dedup,
quality floor, language filter — composed from the engine's existing
stages with one deterministic precedence:

    exact_dup > near_dup > low_quality > non_english > kept

Distributed shape: MinHash-LSH produces the (small) verified near-dup
pair table whose higher doc ids become a broadcast drop-set; one
``map_batches`` pass computes every per-doc signal locally (content
digest, quality score, language id, near-dup flag); a single
groupby(digest) assigns exact-dup keepers (min doc id per identical
text) and folds the precedence — no O(N) driver structure anywhere.

The oracle recomputes the whole composition in SQL from the documents
table, reusing the SAME MinHash CTEs, stopword tables, and quality
expression as the individual pipelines' oracles.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from ..config import DEFAULT
from ..functions.rounding import sql_round6

CURATION_QUALITY_THRESHOLD = 0.2
CURATION_LANG = "en"

_OUT_SCHEMA = pa.schema([("doc_id", pa.int64()), ("status", pa.string())])


@ray.remote
def _drop_set_task(pairs: pa.Table) -> np.ndarray:
    """Near-dup drop policy: of each verified pair (doc_a < doc_b), the
    higher id is dropped. Assembled in a Ray task; driver holds the ref."""
    if pairs.num_rows == 0:
        return np.empty(0, dtype=np.int64)
    return np.unique(
        pairs["doc_b"].to_numpy(zero_copy_only=False).astype(np.int64)
    )


def curate_corpus(sf_dir: str) -> ray.data.Dataset:
    """(doc_id, status) for every document, statuses per the precedence
    above; 'kept' rows form the curated corpus."""
    from ..functions.hashing import sha256_column
    from ..stages import dedup as dedup_stage
    from ..stages import textstats as ts

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    pairs = dedup_stage.minhash_lsh_dedup(docs)
    near_ref = _drop_set_task.remote(pairs)

    def signals(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.schema(
                [("doc_id", pa.int64()), ("digest", pa.string()),
                 ("quality", pa.float64()), ("lang_pred", pa.string()),
                 ("is_near", pa.bool_())]
            ).empty_table()
        near = ray.get(near_ref)
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        quality = ts.quality_batch(t)["quality"]
        lang = ts.langid_batch(t)["lang_pred"]
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "digest": sha256_column(t["text"]),
                "quality": quality,
                "lang_pred": lang,
                "is_near": pa.array(np.isin(ids, near)),
            }
        )

    def assign(g: pa.Table) -> pa.Table:
        ids = g["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        keeper = int(ids.min())
        quality = g["quality"].to_numpy(zero_copy_only=False)
        lang = g["lang_pred"].to_pylist()
        near = g["is_near"].to_numpy(zero_copy_only=False)
        status = []
        for i, d in enumerate(ids):
            if int(d) != keeper:
                status.append("exact_dup")
            elif near[i]:
                status.append("near_dup")
            elif quality[i] < CURATION_QUALITY_THRESHOLD:
                status.append("low_quality")
            elif lang[i] != CURATION_LANG:
                status.append("non_english")
            else:
                status.append("kept")
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "status": pa.array(status, type=pa.string()),
            }
        )

    return (
        docs.map_batches(signals, batch_format="pyarrow")
        .groupby("digest")
        .map_groups(assign, batch_format="pyarrow")
        .sort("doc_id")
    )


def curate_and_write(sf_dir: str, out_dir: str) -> dict:
    """Run curation and write the surviving documents as partitioned
    parquet (the curated corpus artifact); returns status counts."""
    import pyarrow.compute as pc

    from ray.data.aggregate import Count

    statuses = curate_corpus(sf_dir).materialize()
    counts = {
        r["status"]: int(r["count()"])
        for r in statuses.groupby("status").aggregate(Count()).take_all()
    }
    from ..stages.idsets import id_array_ref

    kept_ids = statuses.map_batches(
        lambda t: t.filter(pc.equal(t["status"], "kept")).select(["doc_id"]),
        batch_format="pyarrow",
    )
    kept_ref = id_array_ref(kept_ids)

    def keep_rows(t: pa.Table) -> pa.Table:
        keep = ray.get(kept_ref)
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.filter(pa.array(np.isin(ids, keep)))

    ray.data.read_parquet(f"{sf_dir}/documents.parquet").map_batches(
        keep_rows, batch_format="pyarrow"
    ).write_parquet(out_dir)
    return counts


def curate_corpus_sql() -> str:
    from . import textpipes as tp

    return (
        tp.MINHASH_CTES
        + f""",
near AS (
  SELECT DISTINCT doc_b AS doc_id FROM jac
  WHERE j >= {DEFAULT.jaccard_threshold}
),
qagg AS (
  SELECT doc_id, count(*)::BIGINT AS n_tokens,
         sum(CASE WHEN term IN ({tp._all_stopword_list_sql()}) THEN 1 ELSE 0 END)::BIGINT AS sw
  FROM toks GROUP BY doc_id
),
qfeat AS (
  SELECT d.doc_id,
         length(d.text)::BIGINT AS n_chars,
         coalesce(a.n_tokens, 0)::BIGINT AS n_tokens,
         CASE WHEN coalesce(a.n_tokens, 0) > 0
              THEN coalesce(a.sw, 0) * 1.0 / a.n_tokens ELSE 0.0 END AS ratio
  FROM documents d LEFT JOIN qagg a ON a.doc_id = d.doc_id
),
qual AS (
  SELECT doc_id,
         {sql_round6('least(1.0, n_tokens / 200.0) * 0.4 + least(1.0, n_chars / 500.0) * 0.3 + ratio * 0.3')} AS quality
  FROM qfeat
),
sw(cand, term) AS (VALUES
    {tp._stopword_values()}
),
lcounts AS (
  SELECT t.doc_id, sw.cand, count(*)::BIGINT AS c
  FROM toks t JOIN sw ON sw.term = t.term
  GROUP BY 1, 2
),
lbest AS (
  SELECT doc_id, cand,
         row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, cand ASC) AS rn
  FROM lcounts
),
lang AS (
  SELECT d.doc_id, coalesce(b.cand, 'unknown') AS lang_pred
  FROM documents d LEFT JOIN lbest b ON b.doc_id = d.doc_id AND b.rn = 1
),
keepers AS (
  SELECT doc_id, min(doc_id) OVER (PARTITION BY text) AS keeper
  FROM documents
)
SELECT k.doc_id,
       CASE
         WHEN k.doc_id <> k.keeper THEN 'exact_dup'
         WHEN k.doc_id IN (SELECT doc_id FROM near) THEN 'near_dup'
         WHEN q.quality < {CURATION_QUALITY_THRESHOLD} THEN 'low_quality'
         WHEN l.lang_pred <> '{CURATION_LANG}' THEN 'non_english'
         ELSE 'kept'
       END AS status
FROM keepers k
JOIN qual q ON q.doc_id = k.doc_id
JOIN lang l ON l.doc_id = k.doc_id
ORDER BY k.doc_id
"""
    )


def register_all() -> None:
    from . import registry as r

    r.register("corpus_curation", curate_corpus, curate_corpus_sql())
