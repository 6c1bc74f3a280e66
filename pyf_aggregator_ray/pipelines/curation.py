"""Corpus curation: the composed training-data cleaning pipeline.

The flagship "curate a raw corpus" flow a large-scale training-data
engine runs before tokenization — exact dedup, MinHash near-dedup,
quality floor, language filter — composed from the engine's existing
stages with one deterministic precedence:

    exact_dup > near_dup > low_quality > non_english > kept

Distributed shape: MinHash-LSH produces the (small) verified near-dup
pair table whose higher doc ids become a broadcast drop-set; one
``map_batches`` pass computes every per-doc signal locally in a SINGLE
tokenization (content digest, quality score, language id, near-dup
flag); exact-dup groups come from a vectorized groupby(digest) Min/Count
aggregate whose count>1 survivors — the duplicate groups, the small side
by construction — broadcast as a {digest: keeper} map; a final
vectorized ``map_batches`` folds the precedence. No per-group Python
UDFs and no O(N) driver or broadcast structure anywhere.

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


@ray.remote
def _dup_group_map_task(*tables: pa.Table) -> dict:
    """{digest: keeper doc_id} for digests with >1 occurrence — the
    duplicate groups only, assembled inside a Ray task."""
    out: dict[str, int] = {}
    for t in tables:
        if t.num_rows and "digest" in t.column_names:
            out.update(
                zip(t["digest"].to_pylist(), t["keeper"].to_pylist())
            )
    return out


def curate_corpus(sf_dir: str) -> ray.data.Dataset:
    """(doc_id, status) for every document, statuses per the precedence
    above; 'kept' rows form the curated corpus."""
    from ray.data.aggregate import Count, Min

    from ..functions.hashing import sha256_column
    from ..functions.rounding import round6
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
        # ONE tokenization pass feeds both quality and language-ID
        exploded, ids_arr, toks = ts._exploded_tokens(t)
        texts = t["text"].to_pylist()
        _, _, _, score = ts.quality_features(exploded, ids_arr, toks, texts)
        lang = ts.langid_pred(exploded, ids_arr)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "digest": sha256_column(t["text"]),
                "quality": pa.array(round6(score), type=pa.float64()),
                "lang_pred": pa.array(lang, type=pa.string()),
                "is_near": pa.array(np.isin(ids, near)),
            }
        )

    sig = docs.map_batches(signals, batch_format="pyarrow").materialize()

    # exact-dup groups: vectorized hash aggregate; only digests with >1
    # occurrence (the duplicate groups — small by construction) broadcast
    agg = sig.groupby("digest").aggregate(
        Min("doc_id", alias_name="keeper"), Count(alias_name="n")
    )

    def dup_groups(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        if t.num_rows == 0 or "n" not in t.column_names:
            return t.slice(0, 0)
        return t.filter(pc.greater(t["n"], 1)).select(["digest", "keeper"])

    dup_ref = _dup_group_map_task.remote(
        *agg.map_batches(dup_groups, batch_format="pyarrow").to_arrow_refs()
    )

    def assign(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _OUT_SCHEMA.empty_table()
        dup = ray.get(dup_ref)
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        digests = t["digest"].to_pylist()
        keepers = np.array(
            [dup.get(dg, -1) for dg in digests], dtype=np.int64
        )
        quality = t["quality"].to_numpy(zero_copy_only=False)
        lang = np.asarray(t["lang_pred"].to_pylist(), dtype=object)
        near = t["is_near"].to_numpy(zero_copy_only=False)
        # vectorized precedence fold (first matching rule wins)
        status = np.full(len(ids), "kept", dtype=object)
        status[lang != CURATION_LANG] = "non_english"
        status[quality < CURATION_QUALITY_THRESHOLD] = "low_quality"
        status[near] = "near_dup"
        status[(keepers >= 0) & (ids != keepers)] = "exact_dup"
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "status": pa.array(status, type=pa.string()),
            }
        )

    return sig.map_batches(assign, batch_format="pyarrow").sort("doc_id")


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

    # broadcast the DROPPED ids (bounded by dup/junk counts — the small
    # side of a mostly-kept corpus), never the O(N) kept set
    dropped_ids = statuses.map_batches(
        lambda t: t.filter(
            pc.invert(pc.equal(t["status"], "kept"))
        ).select(["doc_id"]),
        batch_format="pyarrow",
    )
    dropped_ref = id_array_ref(dropped_ids)

    def keep_rows(t: pa.Table) -> pa.Table:
        dropped = ray.get(dropped_ref)
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.filter(pa.array(~np.isin(ids, dropped)))

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
