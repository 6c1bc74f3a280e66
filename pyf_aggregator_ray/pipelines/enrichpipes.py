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


@ray.remote
def _weight_map_task(*tables) -> dict:
    """Assemble the doc->weight map inside a Ray task: the map lives in
    the object store and is read once per scorer actor — the driver only
    holds the ref."""
    out: dict[int, float] = {}
    for t in tables:
        if t.num_rows:
            out.update(zip(t["doc_id"].to_pylist(), t["weight"].to_pylist()))
    return out


def weighted_bm25(sf_dir: str):
    """BM25 with enrichment-derived per-document weight multipliers —
    the reference's weighted-field ranking folded into our scorer."""
    import pyarrow as pa

    from .registry import ensure_index

    root = ensure_index(sf_dir)
    corpus = read_corpus(sf_dir)
    wref = _weight_map_task.remote(
        *enrich.doc_weights_table(corpus).to_arrow_refs()
    )
    ds = q.run_query_set(root, doc_weights=wref)
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


def latest_version_per_package(sf_dir: str):
    """T1/T2: 'latest' semantics — newest version per package by
    version_sortable desc (reference sort_by version_sortable:desc,
    README.md:989-1008; tested against PyPI 'latest' in the reference's
    live-sorting suite). Rows-only; golden-tested in test_transforms."""
    import pandas as pd

    transformed = package_transform(sf_dir)

    def newest(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["version_sortable", "version"], ascending=[False, True])
        return g.head(1)[["name", "version", "version_sortable"]]

    return transformed.groupby("name").map_groups(newest, batch_format="pandas")


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


def register_all() -> None:
    from . import registry as r

    r.register("package_transform", package_transform, package_transform_sql())
    r.register(
        "latest_version_per_package", latest_version_per_package, latest_version_sql()
    )
    r.register("enrich_repo_stats", enrich_repo_stats, REPO_STATS_SQL)
    r.register("enrich_lang_stats", enrich_lang_stats, LANG_STATS_SQL)
    r.register("doc_weights", doc_weights, DOC_WEIGHTS_SQL)
    r.register("weighted_bm25", weighted_bm25, weighted_bm25_oracle_sql())
