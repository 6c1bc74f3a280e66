"""npm second source: M15 schema transform + M16 validity predicate
(behavioral port of npm_fetcher.py:476-578 and :167-191)."""

import json

import pyarrow as pa

import ray.data

from pyf_aggregator_ray.sources import npm


def test_validity_scope_and_keyword():
    assert npm.npm_is_valid("@plone/volto", [])
    assert npm.npm_is_valid("anything", ["CMS"])  # case-insensitive
    assert npm.npm_is_valid("x", ["utils", "Plone"])
    assert not npm.npm_is_valid("@other/pkg", [])
    assert not npm.npm_is_valid("react", ["ui"])
    # a STRING keywords value iterates characters (reference behavior)
    assert not npm.npm_is_valid("vue", "framework, CMS")


def test_transform_author_and_maintainer_coercions():
    doc = npm.npm_transform_doc(
        "@plone/volto", "1.0.0", "2024-01-15T10:30:00Z",
        {"author": {"name": "A", "email": "a@x"},
         "maintainers": [{"name": "M", "email": "m@x"}]},
        "readme",
    )
    assert doc["author"] == "A" and doc["author_email"] == "a@x"
    assert doc["maintainer"] == "M" and doc["maintainer_email"] == "m@x"
    s = npm.npm_transform_doc(
        "p", "1.0.0", "", {"author": "Jane <j@x>", "maintainers": ["bob"]}, ""
    )
    assert s["author"] == "Jane <j@x>" and s["author_email"] == ""
    assert s["maintainer"] == "bob" and s["maintainer_email"] == ""


def test_transform_scope_urls_and_deps():
    doc = npm.npm_transform_doc(
        "@plone/volto", "17.0.0", "2024-01-15T10:30:00Z",
        {"repository": {"url": "git+https://github.com/plone/volto.git"},
         "dependencies": {"react": "^18.2.0", "redux": "~4.2.0"}},
        "",
    )
    assert doc["npm_scope"] == "plone"
    # homepage fallback: git URL normalized to https, .git stripped
    assert doc["home_page"] == "https://github.com/plone/volto"
    assert doc["requires_dist"] == ["react@^18.2.0", "redux@~4.2.0"]
    assert doc["package_url"] == "https://www.npmjs.com/package/%40plone%2Fvolto"
    assert doc["release_url"].endswith("/v/17.0.0")
    assert doc["upload_timestamp"] == 1705314600


def test_transform_deprecated_to_yanked():
    absent = npm.npm_transform_doc("p", "1", "", {}, "")
    assert absent["yanked"] is False and absent["yanked_reason"] == ""
    msg = npm.npm_transform_doc("p", "1", "", {"deprecated": "use q"}, "")
    assert msg["yanked"] is True and msg["yanked_reason"] == "use q"
    flag = npm.npm_transform_doc("p", "1", "", {"deprecated": True}, "")
    assert flag["yanked"] is True and flag["yanked_reason"] == ""


def test_transform_keyword_string_split():
    doc = npm.npm_transform_doc(
        "p", "1", "", {"keywords": "plone, cms , web"}, ""
    )
    assert doc["keywords"] == ["plone", "cms", "web"]


def test_pipeline_filters_and_unifies(ray_session):
    ds = ray.data.from_arrow(npm.synth_npm_raw()).repartition(2)
    out = npm.npm_documents(ds).to_pandas().sort_values("name")
    # invalid rows dropped: react (keyword miss), @other/pkg (scope),
    # vue (string keywords iterate chars)
    assert sorted(out["name"]) == [
        "@plone/components", "@plone/registry", "@plone/volto",
        "@plone/volto", "left-pad", "lodash",
    ]
    assert (out["registry"] == "npm").all()
    assert out.loc[out["name"] == "left-pad", "yanked"].iloc[0]
    # unified schema is stable and typed
    tbl = npm.npm_transform_batch(npm.synth_npm_raw())
    assert tbl.schema.equals(npm._UNIFIED_SCHEMA)


def test_packument_expansion_equals_per_version_rows(ray_session):
    """S6: one packument row expands to one raw row per version, and the
    expanded pipeline yields the same unified documents as the
    per-version source."""
    pk = ray.data.from_arrow(npm.synth_npm_packuments())
    expanded = pk.map_batches(
        npm.expand_packument_batch, batch_format="pyarrow"
    ).to_pandas()
    raw = npm.synth_npm_raw().to_pandas()
    key = ["name", "version"]
    assert (
        sorted(map(tuple, expanded[key].values.tolist()))
        == sorted(map(tuple, raw[key].values.tolist()))
    )
    # volto is multi-version: genuinely 1 -> N
    assert (expanded["name"] == "@plone/volto").sum() == 2

    via_pk = (
        npm.npm_from_packuments(pk)
        .to_pandas()
        .sort_values(key)
        .reset_index(drop=True)
    )
    direct = (
        npm.npm_documents(ray.data.from_arrow(npm.synth_npm_raw()))
        .to_pandas()
        .sort_values(key)
        .reset_index(drop=True)
    )
    assert via_pk.equals(direct)
