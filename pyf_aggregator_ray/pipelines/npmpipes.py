"""npm second-source queries (M15 transform + M16 validity) + oracle.

The engine side parses raw npm JSON documents inside ``map_batches``
(``sources/npm.py``); the oracle re-implements the same coercions in
DuckDB JSON SQL over the SAME raw rows embedded as VALUES literals — an
independent computation path over identical input, like the fieldsearch
oracle. List-valued outputs (keywords, requires_dist) are pipe-joined in
canonical sorted order on BOTH sides so the driver hashes scalars.
"""

from __future__ import annotations

import json

import pyarrow as pa

import ray.data

from ..sources import npm as npm_src


def npm_transform(sf_dir: str) -> pa.Table:
    """Validity-filtered unified documents from the raw npm fixture, list
    columns canonicalized for comparison."""
    ds = ray.data.from_arrow(npm_src.synth_npm_raw()).repartition(2)
    docs = npm_src.npm_documents(ds)

    def flatten(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _OUT_SCHEMA.empty_table()
        rows = t.to_pylist()
        out = []
        for r in rows:
            out.append(
                {
                    "name": r["name"],
                    "version": r["version"],
                    "npm_scope": r["npm_scope"],
                    "author": r["author"],
                    "author_email": r["author_email"],
                    "maintainer": r["maintainer"],
                    "maintainer_email": r["maintainer_email"],
                    "license": r["license"],
                    "keywords": "|".join(sorted(r["keywords"])),
                    "requires_dist": "|".join(sorted(r["requires_dist"])),
                    "home_page": r["home_page"],
                    "homepage_project_url": dict(r["project_urls"] or {}).get(
                        "Homepage", ""
                    ),
                    "repository_url": r["repository_url"],
                    "package_url": r["package_url"],
                    "release_url": r["release_url"],
                    "bugtrack_url": r["bugtrack_url"],
                    "yanked": r["yanked"],
                    "yanked_reason": r["yanked_reason"],
                    "upload_timestamp": r["upload_timestamp"],
                    "registry": r["registry"],
                }
            )
        return pa.Table.from_pylist(out).cast(_OUT_SCHEMA)

    return (
        docs.map_batches(flatten, batch_format="pyarrow")
        .to_pandas()
        .sort_values(["name", "version"])
        .reset_index(drop=True)
        .pipe(lambda df: pa.Table.from_pandas(df, preserve_index=False))
    )


_OUT_SCHEMA = pa.schema(
    [
        ("name", pa.string()),
        ("version", pa.string()),
        ("npm_scope", pa.string()),
        ("author", pa.string()),
        ("author_email", pa.string()),
        ("maintainer", pa.string()),
        ("maintainer_email", pa.string()),
        ("license", pa.string()),
        ("keywords", pa.string()),
        ("requires_dist", pa.string()),
        ("home_page", pa.string()),
        ("homepage_project_url", pa.string()),
        ("repository_url", pa.string()),
        ("package_url", pa.string()),
        ("release_url", pa.string()),
        ("bugtrack_url", pa.string()),
        ("yanked", pa.bool_()),
        ("yanked_reason", pa.string()),
        ("upload_timestamp", pa.int64()),
        ("registry", pa.string()),
    ]
)


def _q(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def npm_transform_sql() -> str:
    scopes = " OR ".join(
        f"name LIKE {_q(s + '/%')}" for s in npm_src.NPM_FILTER_SCOPES
    )
    kws = ", ".join(_q(k.lower()) for k in npm_src.NPM_FILTER_KEYWORDS)
    rows = ",\n  ".join(
        f"({_q(r[0])}, {_q(r[1])}, {_q(r[2])}, {_q(json.dumps(r[3]))}, {_q(r[4])})"
        for r in npm_src._RAW_ROWS
    )
    # home_page fallback replicates normalize_git_url (npm_fetcher.py:580-616):
    # git+http(s):// -> https://, git:// -> https://,
    # (ssh://)git@host[:/]path -> https://host/path, strip trailing .git
    norm_git = (
        "regexp_replace(regexp_replace(regexp_replace(regexp_replace("
        "repository_url, '^git\\+https?://', 'https://'), "
        "'^git://', 'https://'), "
        "'^(ssh://)?git@([^:/]+)[:/](.*)$', 'https://\\2/\\3'), "
        "'\\.git$', '')"
    )
    return f"""
WITH raw(name, version, time_iso, raw, readme) AS (VALUES
  {rows}
),
j AS (
  SELECT name, version, time_iso, readme, raw::JSON AS v,
         CAST(CASE WHEN json_type(raw::JSON, '$.keywords') = 'ARRAY'
                   THEN raw::JSON->'$.keywords' END AS VARCHAR[]) AS kwarr
  FROM raw
),
valid AS (
  SELECT * FROM j
  WHERE {scopes}
     OR length(list_filter(coalesce(kwarr, []),
                           k -> lower(k) IN ({kws}))) > 0
),
xf AS (
  SELECT name, version,
    CASE WHEN name LIKE '@%' THEN ltrim(string_split(name, '/')[1], '@')
         ELSE '' END AS npm_scope,
    CASE json_type(v, '$.author')
      WHEN 'VARCHAR' THEN v->>'$.author'
      WHEN 'OBJECT' THEN coalesce(v->>'$.author.name', '')
      ELSE '' END AS author,
    CASE WHEN json_type(v, '$.author') = 'OBJECT'
         THEN coalesce(v->>'$.author.email', '') ELSE '' END AS author_email,
    CASE WHEN coalesce(json_array_length(v, '$.maintainers'), 0) > 0 THEN
      CASE WHEN json_type(v, '$.maintainers[0]') = 'VARCHAR'
           THEN v->>'$.maintainers[0]'
           ELSE coalesce(v->>'$.maintainers[0].name', '') END
    ELSE '' END AS maintainer,
    CASE WHEN coalesce(json_array_length(v, '$.maintainers'), 0) > 0
              AND json_type(v, '$.maintainers[0]') = 'OBJECT'
         THEN coalesce(v->>'$.maintainers[0].email', '')
         ELSE '' END AS maintainer_email,
    coalesce(v->>'$.license', '') AS license,
    CASE
      WHEN kwarr IS NOT NULL THEN array_to_string(list_sort(kwarr), '|')
      WHEN json_type(v, '$.keywords') = 'VARCHAR' THEN
        array_to_string(list_sort(list_filter(
          list_transform(string_split(v->>'$.keywords', ','), s -> trim(s)),
          s -> s <> '')), '|')
      ELSE '' END AS keywords,
    CASE WHEN (v->'$.dependencies') IS NOT NULL THEN
      array_to_string(list_sort(list_transform(
        json_keys(v, '$.dependencies'),
        k -> k || '@' || (v->>('$.dependencies."' || k || '"')))), '|')
    ELSE '' END AS requires_dist,
    coalesce(v->>'$.repository.url',
             CASE WHEN json_type(v, '$.repository') = 'VARCHAR'
                  THEN v->>'$.repository' END, '') AS repository_url,
    coalesce(v->>'$.homepage', '') AS homepage_raw,
    coalesce(v->>'$.bugs.url', '') AS bugtrack_url,
    CASE WHEN json_type(v, '$.deprecated') IS NULL THEN false
         WHEN json_type(v, '$.deprecated') = 'BOOLEAN'
              AND NOT CAST(v->'$.deprecated' AS BOOLEAN) THEN false
         ELSE true END AS yanked,
    CASE WHEN json_type(v, '$.deprecated') = 'VARCHAR'
         THEN v->>'$.deprecated' ELSE '' END AS yanked_reason,
    epoch(CAST(time_iso AS TIMESTAMPTZ))::BIGINT AS upload_timestamp,
    replace(replace(name, '@', '%40'), '/', '%2F') AS quoted
  FROM valid
)
SELECT name, version, npm_scope, author, author_email, maintainer,
       maintainer_email, license, keywords, requires_dist,
       CASE WHEN homepage_raw <> '' THEN homepage_raw
            WHEN repository_url <> '' THEN {norm_git}
            ELSE '' END AS home_page,
       -- project_urls carries {{"Homepage": home_page}} when present
       -- (npm_fetcher.py:573); flattened for comparison
       CASE WHEN homepage_raw <> '' THEN homepage_raw
            WHEN repository_url <> '' THEN {norm_git}
            ELSE '' END AS homepage_project_url,
       repository_url,
       'https://www.npmjs.com/package/' || quoted AS package_url,
       'https://www.npmjs.com/package/' || quoted || '/v/' || version AS release_url,
       bugtrack_url, yanked, yanked_reason, upload_timestamp,
       'npm' AS registry
FROM xf
ORDER BY name, version
"""


def npm_version_expansion(sf_dir: str) -> pa.Table:
    """S6: packument -> one row per version (row-expanding map_batches)
    with the M5 ISO->unix timestamp parse."""
    ds = ray.data.from_arrow(npm_src.synth_npm_packuments()).repartition(2)
    expanded = ds.map_batches(
        npm_src.expand_packument_batch, batch_format="pyarrow"
    )

    def project(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "name": t["name"],
                "version": t["version"],
                "upload_timestamp": pa.array(
                    [npm_src._iso_to_unix(x) for x in t["time_iso"].to_pylist()],
                    type=pa.int64(),
                ),
            }
        )

    return (
        expanded.map_batches(project, batch_format="pyarrow")
        .to_pandas()
        .sort_values(["name", "version"])
        .reset_index(drop=True)
        .pipe(lambda df: pa.Table.from_pandas(df, preserve_index=False))
    )


def npm_version_expansion_sql() -> str:
    rows = ",\n  ".join(
        f"({_q(n)}, {_q(p)})"
        for n, p in zip(
            npm_src.synth_npm_packuments()["name"].to_pylist(),
            npm_src.synth_npm_packuments()["packument"].to_pylist(),
        )
    )
    return f"""
WITH pk(name, packument) AS (VALUES
  {rows}
),
vers AS (
  SELECT name, packument,
         unnest(json_keys(packument::JSON, '$.versions')) AS version
  FROM pk
)
SELECT name, version,
       epoch(CAST(packument::JSON->>('$.time."' || version || '"')
                  AS TIMESTAMPTZ))::BIGINT AS upload_timestamp
FROM vers
ORDER BY name, version
"""


def register_all() -> None:
    from . import registry as r

    r.register("npm_transform", npm_transform, npm_transform_sql())
    r.register(
        "npm_version_expansion", npm_version_expansion, npm_version_expansion_sql()
    )
