"""npm second source: schema transform (M15) + validity predicate (M16).

Behavioral port of the reference npm reader's per-version document
transform (``/root/reference/src/pyf/aggregator/npm_fetcher.py:476-578``)
and search-result validity predicate (``npm_fetcher.py:167-191``):

* scope extraction from scoped names (``@scope/pkg``)
* author/maintainer coercions (string vs object vs missing)
* keywords array vs comma-separated string
* repository object-vs-string + homepage fallback through the git-URL ->
  https normalizer (``npm_fetcher.py:580-616``)
* dependencies -> ``requires_dist`` (``name@range`` strings)
* ``deprecated`` -> ``yanked`` / ``yanked_reason``
* npmjs package/release URLs (fully percent-encoded name)
* validity: name in a configured scope OR a configured keyword present
  (case-insensitive; a string keywords value iterates characters, as in
  the reference, and therefore never matches a multi-char keyword)

The source rows model what the npm registry returns: a raw JSON document
per (package, version) plus the root-level readme — the transform parses
JSON inside ``map_batches``, exactly the reader's unit of work. One
divergence, normalized at the transform: ``upload_time`` ISO strings
become int64 ``upload_timestamp`` (the reference carries the string and
converts at indexing; our schema is typed at the source).
"""

from __future__ import annotations

import json
from datetime import datetime
from urllib.parse import quote

import pyarrow as pa

import ray.data

from ..functions.transforms import normalize_git_url

NPM_FILTER_SCOPES = ("@plone",)
NPM_FILTER_KEYWORDS = ("plone", "cms")


# (name, version, time_iso, version_data, readme) — deterministic fixture
# covering every transform branch; react, @other/pkg and vue are invalid
# per M16 (keyword miss / foreign scope / string-keywords char iteration).
_RAW_ROWS: list[tuple[str, str, str, dict, str]] = [
    (
        "@plone/volto", "17.0.0", "2024-01-15T10:30:00Z",
        {
            "version": "17.0.0",
            "description": "The Plone frontend",
            "author": {"name": "Plone Foundation", "email": "info@plone.org"},
            "maintainers": [{"name": "sneridagh", "email": "s@plone.org"}],
            "keywords": ["react", "cms"],
            "repository": {"url": "git+https://github.com/plone/volto.git"},
            "dependencies": {"react": "^18.2.0", "redux": "~4.2.0"},
            "bugs": {"url": "https://github.com/plone/volto/issues"},
            "license": "MIT",
        },
        "# Volto\n\nThe frontend.",
    ),
    (
        "@plone/volto", "16.8.0", "2023-04-02T09:00:00Z",
        {
            "version": "16.8.0",
            "description": "The Plone frontend",
            "author": {"name": "Plone Foundation", "email": "info@plone.org"},
            "maintainers": [{"name": "sneridagh", "email": "s@plone.org"}],
            "keywords": ["react", "cms"],
            "repository": {"url": "git+https://github.com/plone/volto.git"},
            "dependencies": {"react": "^17.0.0"},
            "license": "MIT",
        },
        "# Volto\n\nThe frontend.",
    ),
    (
        "@plone/registry", "2.1.0", "2023-11-02T08:00:00Z",
        {
            "version": "2.1.0",
            "description": "Registry",
            "author": "Jane Dev <jane@example.org>",
            "maintainers": ["bob"],
            "keywords": "plone, cms , web",
            "repository": "git://github.com/plone/registry.git",
            "homepage": "https://plone.org/registry",
            "deprecated": "use @plone/new-registry instead",
            "license": "GPL",
        },
        "",
    ),
    (
        "left-pad", "0.0.3", "2016-03-23T00:00:00Z",
        {
            "version": "0.0.3",
            "description": "pads left",
            "maintainers": [],
            "keywords": ["CMS"],
            "repository": "git@github.com:stevemao/left-pad.git",
            "deprecated": True,
        },
        "left pad readme",
    ),
    (
        "react", "18.0.0", "2022-03-29T00:00:00Z",
        {"version": "18.0.0", "description": "ui lib", "keywords": ["ui"]},
        "react readme",
    ),
    (
        "@plone/components", "1.0.0", "2024-06-01T12:00:00Z",
        {"version": "1.0.0", "description": "components"},
        "",
    ),
    (
        "lodash", "4.17.21", "2021-02-20T15:42:00Z",
        {
            "version": "4.17.21",
            "description": "utils",
            "keywords": ["utils", "Plone"],
            "repository": {"url": "git+ssh://git@github.com/lodash/lodash.git"},
            "dependencies": {"zebra": "1.0.0", "alpha": "2.0.0"},
            "license": "MIT",
        },
        "lodash readme",
    ),
    (
        "@other/pkg", "1.0.0", "2024-01-01T00:00:00Z",
        {"version": "1.0.0", "description": "other scope"},
        "",
    ),
    (
        "vue", "3.4.0", "2024-02-02T02:00:00Z",
        {
            "version": "3.4.0",
            "description": "framework",
            "keywords": "framework, CMS",
        },
        "",
    ),
]


def synth_npm_raw() -> pa.Table:
    """Raw npm rows as the registry would return them (JSON documents),
    one row per (package, version)."""
    return pa.table(
        {
            "name": pa.array([r[0] for r in _RAW_ROWS], type=pa.string()),
            "version": pa.array([r[1] for r in _RAW_ROWS], type=pa.string()),
            "time_iso": pa.array([r[2] for r in _RAW_ROWS], type=pa.string()),
            "raw": pa.array(
                [json.dumps(r[3]) for r in _RAW_ROWS], type=pa.string()
            ),
            "readme": pa.array([r[4] for r in _RAW_ROWS], type=pa.string()),
        }
    )


def synth_npm_packuments() -> pa.Table:
    """One packument row per PACKAGE: the registry's real response shape —
    a ``versions`` object keyed by version plus a ``time`` map and the
    root-level readme (reference ``npm_fetcher.py:331-392``)."""
    by_pkg: dict[str, dict] = {}
    for name, version, time_iso, version_data, readme in _RAW_ROWS:
        doc = by_pkg.setdefault(
            name, {"versions": {}, "time": {}, "readme": readme}
        )
        doc["versions"][version] = version_data
        doc["time"][version] = time_iso
    names = sorted(by_pkg)
    return pa.table(
        {
            "name": pa.array(names, type=pa.string()),
            "packument": pa.array(
                [json.dumps(by_pkg[n]) for n in names], type=pa.string()
            ),
        }
    )


def expand_packument_batch(t: pa.Table) -> pa.Table:
    """S6 (1-row -> N-rows): one packument expands to one raw row per
    version (reference ``_build_version_records``,
    ``npm_fetcher.py:664-702``) — a row-expanding map_batches, the
    Dataset-native flat_map shape."""
    names, versions, times, raws, readmes = [], [], [], [], []
    for name, packument in zip(
        t["name"].to_pylist(), t["packument"].to_pylist()
    ):
        doc = json.loads(packument)
        time_info = doc.get("time", {})
        readme = doc.get("readme", "")
        for version in sorted(doc.get("versions", {})):
            names.append(name)
            versions.append(version)
            times.append(time_info.get(version, ""))
            raws.append(json.dumps(doc["versions"][version]))
            readmes.append(readme)
    return pa.table(
        {
            "name": pa.array(names, type=pa.string()),
            "version": pa.array(versions, type=pa.string()),
            "time_iso": pa.array(times, type=pa.string()),
            "raw": pa.array(raws, type=pa.string()),
            "readme": pa.array(readmes, type=pa.string()),
        }
    )


def npm_from_packuments(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Packument Dataset -> per-version raw rows -> unified documents."""
    return npm_documents(
        ds.map_batches(expand_packument_batch, batch_format="pyarrow")
    )


def npm_is_valid(
    name: str,
    keywords,
    scopes: tuple[str, ...] = NPM_FILTER_SCOPES,
    filter_keywords: tuple[str, ...] = NPM_FILTER_KEYWORDS,
) -> bool:
    """M16 (``npm_fetcher.py:167-191``): configured scope OR configured
    keyword, case-insensitive. Iterating a STRING keywords value yields
    characters (reference behavior preserved)."""
    for scope in scopes:
        if name.startswith(f"{scope}/"):
            return True
    kw_lower = {k.lower() for k in (keywords or []) if isinstance(k, str)}
    return any(kw.lower() in kw_lower for kw in filter_keywords)


def _iso_to_unix(iso: str) -> int:
    """M5: ISO-8601 (Z tolerated) -> unix int64, 0 on failure."""
    if not iso:
        return 0
    try:
        return int(datetime.fromisoformat(iso.replace("Z", "+00:00")).timestamp())
    except ValueError:
        return 0


def npm_transform_doc(
    name: str, version: str, time_iso: str, version_data: dict, readme: str
) -> dict:
    """M15: one npm version document -> the unified package schema.

    Total on messy registry JSON (property-tested): the reference's
    str-vs-dict coercions are preserved exactly, and any OTHER shape
    (bools, numbers, wrong containers) degrades to the field's empty
    default instead of raising."""
    npm_scope = name.split("/")[0].lstrip("@") if name.startswith("@") else ""

    repository = version_data.get("repository", {})
    if isinstance(repository, str):
        repository_url = repository
    elif isinstance(repository, dict):
        repository_url = repository.get("url", "") or ""
    else:
        repository_url = ""
    home_page = version_data.get("homepage", "")
    if not isinstance(home_page, str):
        home_page = ""
    if not home_page and repository_url:
        home_page = normalize_git_url(repository_url) or ""

    author = version_data.get("author", {})
    if isinstance(author, str):
        author_name, author_email = author, ""
    elif isinstance(author, dict):
        author_name = author.get("name", "") or ""
        author_email = author.get("email", "") or ""
    else:
        author_name = author_email = ""

    maintainers = version_data.get("maintainers", [])
    maintainer_name = maintainer_email = ""
    if isinstance(maintainers, list) and maintainers:
        first = maintainers[0]
        if isinstance(first, str):
            maintainer_name = first
        elif isinstance(first, dict):
            maintainer_name = first.get("name", "") or ""
            maintainer_email = first.get("email", "") or ""

    keywords = version_data.get("keywords", [])
    if isinstance(keywords, str):
        keywords = [k.strip() for k in keywords.split(",") if k.strip()]
    elif isinstance(keywords, list):
        keywords = [k for k in keywords if isinstance(k, str)]
    else:
        keywords = []

    deps = version_data.get("dependencies", {})
    requires_dist = (
        [f"{k}@{v}" for k, v in deps.items()] if isinstance(deps, dict) else []
    )

    quoted = quote(name, safe="")
    deprecated = version_data.get("deprecated", False)
    bugs = version_data.get("bugs")
    return {
        "name": name,
        "name_sortable": name,
        "version": version,
        "summary": (
            version_data.get("description", "")
            if isinstance(version_data.get("description", ""), str)
            else ""
        ),
        "description": readme or "",
        "description_content_type": "text/markdown",
        "author": author_name,
        "author_email": author_email,
        "maintainer": maintainer_name,
        "maintainer_email": maintainer_email,
        "license": (
            version_data.get("license", "")
            if isinstance(version_data.get("license", ""), str)
            else ""
        ),
        "keywords": keywords,
        "classifiers": [],
        "framework_versions": [],
        "python_versions": [],
        "home_page": home_page,
        "repository_url": repository_url,
        "project_url": "",
        "project_urls": {"Homepage": home_page} if home_page else {},
        "urls": [],
        "package_url": f"https://www.npmjs.com/package/{quoted}",
        "release_url": f"https://www.npmjs.com/package/{quoted}/v/{version}",
        "docs_url": "",
        "bugtrack_url": bugs.get("url", "") if isinstance(bugs, dict) else "",
        "requires_dist": requires_dist,
        "platform": "node",
        "yanked": deprecated is not False,
        "yanked_reason": deprecated if isinstance(deprecated, str) else "",
        "upload_timestamp": _iso_to_unix(time_iso),
        "registry": "npm",
        "npm_scope": npm_scope,
    }


def npm_transform_batch(
    t: pa.Table,
    scopes: tuple[str, ...] = NPM_FILTER_SCOPES,
    filter_keywords: tuple[str, ...] = NPM_FILTER_KEYWORDS,
) -> pa.Table:
    """Validity filter + schema transform over a raw npm batch (the
    reader's unit of work: parse each JSON document, coerce, emit the
    unified schema). Scope/keyword filters are parameterizable (profile
    surface)."""
    out = []
    for name, version, time_iso, raw, readme in zip(
        t["name"].to_pylist(),
        t["version"].to_pylist(),
        t["time_iso"].to_pylist(),
        t["raw"].to_pylist(),
        t["readme"].to_pylist(),
    ):
        version_data = json.loads(raw)
        if not npm_is_valid(
            name, version_data.get("keywords", []),
            scopes=scopes, filter_keywords=filter_keywords,
        ):
            continue
        out.append(npm_transform_doc(name, version, time_iso, version_data, readme))
    if not out:
        return _UNIFIED_SCHEMA.empty_table()
    # schema given up front: from_pylist builds project_urls as a true
    # map column (a post-hoc struct->map cast is unimplemented in Arrow)
    return pa.Table.from_pylist(out, schema=_UNIFIED_SCHEMA)


_UNIFIED_SCHEMA = pa.schema(
    [
        ("name", pa.string()),
        ("name_sortable", pa.string()),
        ("version", pa.string()),
        ("summary", pa.string()),
        ("description", pa.string()),
        ("description_content_type", pa.string()),
        ("author", pa.string()),
        ("author_email", pa.string()),
        ("maintainer", pa.string()),
        ("maintainer_email", pa.string()),
        ("license", pa.string()),
        ("keywords", pa.list_(pa.string())),
        ("classifiers", pa.list_(pa.string())),
        ("framework_versions", pa.list_(pa.string())),
        ("python_versions", pa.list_(pa.string())),
        ("home_page", pa.string()),
        ("repository_url", pa.string()),
        ("project_url", pa.string()),
        ("project_urls", pa.map_(pa.string(), pa.string())),
        ("urls", pa.list_(pa.string())),
        ("package_url", pa.string()),
        ("release_url", pa.string()),
        ("docs_url", pa.string()),
        ("bugtrack_url", pa.string()),
        ("requires_dist", pa.list_(pa.string())),
        ("platform", pa.string()),
        ("yanked", pa.bool_()),
        ("yanked_reason", pa.string()),
        ("upload_timestamp", pa.int64()),
        ("registry", pa.string()),
        ("npm_scope", pa.string()),
    ]
)


def npm_documents(
    ds: ray.data.Dataset,
    scopes: tuple[str, ...] = NPM_FILTER_SCOPES,
    filter_keywords: tuple[str, ...] = NPM_FILTER_KEYWORDS,
) -> ray.data.Dataset:
    """Raw npm Dataset -> unified, validity-filtered document Dataset."""
    return ds.map_batches(
        lambda t: npm_transform_batch(t, scopes, filter_keywords),
        batch_format="pyarrow",
    )
