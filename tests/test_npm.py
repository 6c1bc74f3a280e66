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


class TestNpmPackageFiltering:
    """Reference test_npm_fetcher.py:592-718 — the _is_valid_package
    matrix over npm_is_valid (M16)."""

    KW = ("plone",)
    SCOPES = ("@plone",)

    def test_matching_keyword(self):
        assert npm.npm_is_valid(
            "some-plone-addon", ["plone", "addon"], self.SCOPES, self.KW
        )

    def test_matching_scope(self):
        assert npm.npm_is_valid("@plone/volto", [], self.SCOPES, self.KW)

    def test_case_insensitive_keyword(self):
        assert npm.npm_is_valid("some-addon", ["PLONE", "React"], (), self.KW)

    def test_rejects_non_matching(self):
        assert not npm.npm_is_valid(
            "svelte-kit", ["svelte", "kit", "framework"], self.SCOPES, self.KW
        )

    def test_rejects_plone_in_name_only(self):
        # the NAME never matches keywords — only scope prefixes
        assert not npm.npm_is_valid(
            "plone-like-framework", ["framework", "web"], self.SCOPES, self.KW
        )

    def test_handles_empty_keywords(self):
        assert not npm.npm_is_valid("random-package", None, self.SCOPES, self.KW)
        assert not npm.npm_is_valid("random-package", [], self.SCOPES, self.KW)

    def test_handles_non_string_keywords(self):
        assert npm.npm_is_valid(
            "some-package", ["plone", None, 123, "other"], (), self.KW
        )

    def test_multiple_scopes(self):
        scopes = ("@plone", "@plone-collective", "@eeacms")
        for name, ok in [
            ("@plone/volto", True),
            ("@plone-collective/addon", True),
            ("@eeacms/volto-addon", True),
            ("@other/package", False),
        ]:
            assert npm.npm_is_valid(name, [], scopes, ()) is ok

    def test_scope_requires_slash_boundary(self):
        # "@plonex/addon" must not match scope "@plone"
        assert not npm.npm_is_valid("@plonex/addon", [], ("@plone",), ())


class TestNpmTransformCoercions:
    """Reference test_npm_fetcher.py:365-470 — messy registry JSON
    shapes degrade, never raise."""

    def test_string_repository(self):
        doc = npm.npm_transform_doc(
            "pkg", "1.0.0", "2024-01-01T00:00:00Z",
            {"repository": "git+https://github.com/o/r.git"}, "",
        )
        assert doc["repository_url"] == "git+https://github.com/o/r.git"
        # homepage falls back to the normalized https form
        assert doc["home_page"] == "https://github.com/o/r"

    def test_dict_repository(self):
        doc = npm.npm_transform_doc(
            "pkg", "1.0.0", "",
            {"repository": {"type": "git",
                            "url": "git://github.com/o/r.git"}}, "",
        )
        assert doc["repository_url"] == "git://github.com/o/r.git"

    def test_description_comes_from_readme(self):
        # npm "description" is the one-liner (summary); the README body
        # is the document description (test_npm_fetcher.py:448-470)
        doc = npm.npm_transform_doc(
            "pkg", "1.0.0", "", {"description": "one-liner"}, "# README body"
        )
        assert doc["summary"] == "one-liner"
        assert doc["description"] == "# README body"
        assert doc["description_content_type"] == "text/markdown"

    def test_bugs_url(self):
        doc = npm.npm_transform_doc(
            "pkg", "1.0.0", "",
            {"bugs": {"url": "https://github.com/o/r/issues"}}, "",
        )
        assert doc["bugtrack_url"] == "https://github.com/o/r/issues"

    def test_non_string_license_degrades_empty(self):
        doc = npm.npm_transform_doc(
            "pkg", "1.0.0", "", {"license": {"type": "MIT"}}, ""
        )
        assert doc["license"] == ""

    def test_package_and_release_urls_quote_scoped_names(self):
        doc = npm.npm_transform_doc("@scope/pkg", "2.0.0", "", {}, "")
        assert doc["package_url"] == "https://www.npmjs.com/package/%40scope%2Fpkg"
        assert (
            doc["release_url"]
            == "https://www.npmjs.com/package/%40scope%2Fpkg/v/2.0.0"
        )
        assert doc["npm_scope"] == "scope"

    def test_dependencies_become_requires_dist(self):
        doc = npm.npm_transform_doc(
            "pkg", "1.0.0", "", {"dependencies": {"react": "^18", "redux": "4.x"}}, ""
        )
        assert sorted(doc["requires_dist"]) == ["react@^18", "redux@4.x"]

    def test_invalid_timestamp_is_zero(self):
        assert (
            npm.npm_transform_doc("p", "1", "not-a-date", {}, "")[
                "upload_timestamp"
            ]
            == 0
        )
