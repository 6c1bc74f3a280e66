"""Health-score goldens ported from the reference suite
(/root/reference/tests/test_health_score.py) against the breakdown
report form: recency buckets + timestamp-parsing quirks, word counting,
docs-url validation, docs score composition, the 500-word README rule,
metadata problems, and the integration scenarios. ``now`` is a fixed
injected timestamp (determinism contract) — the reference's wall-clock
offsets become offsets from NOW_TS."""

from datetime import datetime, timedelta, timezone

import pyf_aggregator_ray.functions.transforms as tf

NOW_TS = 1_755_000_000  # 2025-08-12T11:20:00Z
NOW_DT = datetime.fromtimestamp(NOW_TS, tz=timezone.utc)

DOC_PROBLEM = (
    "not enough documentation (extend README to 500+ words"
    " or add documentation link)"
)


def days_ago_iso(days: int) -> str:
    return (NOW_DT - timedelta(days=days)).isoformat()


def recency(ts):
    return tf._recency_with_problems(ts, NOW_TS)


class TestRecencyScore:
    # reference test_health_score.py:189-308
    def test_buckets_iso(self):
        for days, score in [
            (90, 40),
            (1, 40),
            (270, 30),
            (540, 20),
            (912, 10),
            (1460, 5),
            (2190, 0),
        ]:
            assert recency(days_ago_iso(days))[0] == score, days

    def test_buckets_unix(self):
        for days, score in [(90, 40), (270, 30), (2190, 0)]:
            assert recency(NOW_TS - days * 86400)[0] == score, days

    def test_boundaries(self):
        # exactly 180 days -> the 6-12 month bucket; exactly 365 -> 1-2y
        assert recency(days_ago_iso(180))[0] == 30
        assert recency(days_ago_iso(365))[0] == 20

    def test_missing_and_invalid(self):
        for bad in (None, "", 0, "not-a-timestamp"):
            score, problems = recency(bad)
            assert score == 0, bad
            assert problems == ["no release timestamp"], bad

    def test_z_suffix(self):
        ts = days_ago_iso(90).replace("+00:00", "Z")
        assert recency(ts)[0] == 40

    def test_float_rejected(self):
        # reference quirk: only int and str accepted; floats fall to the
        # "no release timestamp" branch (health_score.py:100-110)
        assert recency(float(NOW_TS - 90 * 86400)) == (
            0,
            ["no release timestamp"],
        )

    def test_naive_iso_rejected(self):
        # reference quirk: a NAIVE iso string raises on the aware
        # subtraction inside the try -> reported as missing
        naive = (NOW_DT - timedelta(days=90)).replace(tzinfo=None).isoformat()
        assert recency(naive) == (0, ["no release timestamp"])

    def test_problem_strings_per_bucket(self):
        assert recency(days_ago_iso(90))[1] == []
        assert recency(days_ago_iso(270))[1] == ["last release over 6 months ago"]
        assert recency(days_ago_iso(540))[1] == ["last release over 1 year ago"]
        assert recency(days_ago_iso(912))[1] == ["last release over 2 years ago"]
        assert recency(days_ago_iso(1460))[1] == ["last release over 3 years ago"]
        assert recency(days_ago_iso(2190))[1] == ["last release over 5 years ago"]


class TestCountWords:
    # reference test_health_score.py:312-345
    def test_counts(self):
        assert tf.count_words("one two three") == 3
        assert tf.count_words("hello world") == 2
        assert tf.count_words("single") == 1
        assert tf.count_words("") == 0
        assert tf.count_words(None) == 0
        assert tf.count_words("one   two    three") == 3
        assert tf.count_words("one\ntwo\tthree") == 3
        assert tf.count_words("<p>This is a paragraph with eight words total.</p>") >= 8


class TestMeaningfulDocsUrl:
    # reference test_health_score.py:349-445
    def test_rejects(self):
        for url in (
            "https://pypi.org/project/example/",
            "https://github.com/user/repo",
            "https://github.com/user/repo#readme",
            "https://gitlab.com/user/repo",
            "",
            None,
        ):
            assert not tf.is_meaningful_docs_url(url), url

    def test_accepts(self):
        for url in (
            "https://example.readthedocs.io/en/latest/",
            "https://github.com/user/repo/wiki",
            "https://github.com/user/repo/blob/main/docs/index.md",
            "https://example.com/docs",
        ):
            assert tf.is_meaningful_docs_url(url), url


def docs(doc):
    return tf._docs_with_problems(doc)


class TestDocsScore:
    # reference test_health_score.py:457-598
    def test_point_components(self):
        assert docs({"docs_url": "https://docs.example.com"})[0] == 4
        assert docs({"description": "A" * 151})[0] == 18
        assert docs({"description": "A" * 150})[0] == 0
        for key in ("Documentation", "Docs", "Homepage", "Home", "DOCUMENTATION"):
            assert docs({"project_urls": {key: "https://docs.example.com"}})[0] == 3

    def test_only_counts_project_urls_once(self):
        d = {
            "project_urls": {
                "Documentation": "https://docs.example.com",
                "Homepage": "https://example.com",
                "Docs": "https://docs2.example.com",
            }
        }
        assert docs(d)[0] == 3

    def test_all_factors_is_30(self):
        d = {
            "docs_url": "https://docs.example.com",
            "description": "A" * 151
            + '<img src="https://example.com/screenshot.png" width="400">',
            "project_urls": {"Documentation": "https://docs.example.com"},
        }
        assert docs(d)[0] == 30  # 4 + 18 + 3 + 5

    def test_without_screenshot_is_25(self):
        d = {
            "docs_url": "https://docs.example.com",
            "description": "A" * 151,
            "project_urls": {"Documentation": "https://docs.example.com"},
        }
        assert docs(d)[0] == 25

    def test_screenshot_only_is_5(self):
        d = {
            "description": '<img src="https://example.com/screenshot.png" width="400">'
        }
        assert docs(d)[0] == 5

    def test_badges_dont_count(self):
        d = {
            "description": '<img src="https://img.shields.io/badge/test.svg" width="400">'
        }
        assert docs(d)[0] == 0

    def test_empty_variants(self):
        for d in (
            {},
            {"description": ""},
            {"description": None},
            {"project_urls": {}},
            {"project_urls": None},
            {
                "project_urls": {
                    "Source": "https://github.com/example/project",
                    "Issues": "https://github.com/example/project/issues",
                }
            },
        ):
            assert docs(d)[0] == 0, d

    def test_bonus_entries_tracked(self):
        _, _, bonuses = docs({"docs_url": "https://docs.example.com"})
        assert {"reason": "has dedicated docs URL", "points": 4} in bonuses
        _, problems, bonuses = docs(
            {"project_urls": {"Documentation": "https://docs.example.com"}}
        )
        assert {"reason": "has documentation project URL", "points": 3} in bonuses
        assert "no docs_url" not in problems


class TestDocumentationLinkRequirement:
    # reference test_health_score.py:604-783 (the 500-word rule)
    def test_long_readme_no_problem(self):
        d = {
            "main_content": "<p>" + " ".join(["word"] * 600) + "</p>",
            "description": "A" * 151,
        }
        assert DOC_PROBLEM not in docs(d)[1]

    def test_short_readme_with_docs_url_no_problem(self):
        d = {
            "main_content": "<p>Short content</p>",
            "docs_url": "https://docs.example.com",
            "description": "A" * 151,
        }
        assert DOC_PROBLEM not in docs(d)[1]

    def test_short_readme_with_doc_links_no_problem(self):
        d = {
            "main_content": "<p>Short content</p>",
            "project_urls": {"Documentation": "https://docs.example.com"},
            "description": "A" * 151,
        }
        assert DOC_PROBLEM not in docs(d)[1]

    def test_short_readme_no_external_docs_reports_problem(self):
        d = {"main_content": "<p>Short content</p>", "description": "A" * 151}
        assert DOC_PROBLEM in docs(d)[1]

    def test_empty_readme_reports_problem(self):
        d = {"main_content": "", "description": "A" * 151}
        assert DOC_PROBLEM in docs(d)[1]

    def test_500_word_boundary(self):
        base = {"description": "A" * 151}
        at = dict(base, main_content="<p>" + " ".join(["word"] * 500) + "</p>")
        under = dict(base, main_content="<p>" + " ".join(["word"] * 499) + "</p>")
        assert DOC_PROBLEM not in docs(at)[1]
        assert DOC_PROBLEM in docs(under)[1]

    def test_first_chapter_and_main_content_combined(self):
        half = "<p>" + " ".join(["word"] * 250) + "</p>"
        d = {"first_chapter": half, "main_content": half, "description": "A" * 151}
        assert DOC_PROBLEM not in docs(d)[1]

    def test_word_count_excludes_changelog(self):
        d = {
            "main_content": "<p>" + " ".join(["word"] * 200) + "</p>",
            "changelog": "<p>" + " ".join(["changelog_word"] * 1000) + "</p>",
            "description": "A" * 151,
        }
        assert DOC_PROBLEM in docs(d)[1]


def meta(doc):
    return tf._metadata_with_problems(doc)


class TestMetadataScore:
    # reference test_health_score.py:787-880
    def test_point_components(self):
        assert meta({"maintainer": "John Doe"})[0] == 10
        assert meta({"author": "Jane Doe"})[0] == 10
        assert meta({"maintainer": "John", "author": "Jane"})[0] == 10
        assert meta({"license": "MIT"})[0] == 10
        assert meta({"classifiers": ["A", "B", "C"]})[0] == 10
        assert meta({"classifiers": ["A", "B", "C", "D"]})[0] == 10
        assert meta({"classifiers": ["A", "B"]})[0] == 0
        assert meta({"classifiers": []})[0] == 0
        assert meta({"classifiers": None})[0] == 0

    def test_all_factors_is_30(self):
        d = {
            "maintainer": "Team",
            "license": "MIT",
            "classifiers": ["A", "B", "C"],
        }
        assert meta(d)[0] == 30

    def test_empty_values_score_zero(self):
        for d in ({}, {"maintainer": ""}, {"author": ""}, {"license": ""}):
            assert meta(d)[0] == 0, d

    def test_both_missing_reports_both_problems(self):
        _, problems, _ = meta({})
        assert "no maintainer info" in problems
        assert "no author info" in problems
        assert "no license" in problems
        assert "fewer than 3 classifiers" in problems

    def test_npm_counts_keywords(self):
        assert meta({"registry": "npm", "keywords": ["a", "b", "c"]})[0] == 10
        _, problems, _ = meta({"registry": "npm", "keywords": ["a"]})
        assert "fewer than 3 keywords" in problems


class TestIntegrationScenarios:
    # reference test_health_score.py:911-965
    def test_perfect_score(self):
        d = {
            "upload_timestamp": NOW_TS,
            "docs_url": "https://docs.example.com",
            "description": "A" * 200
            + '<img src="https://example.com/screenshot.png" width="400">',
            "project_urls": {"Documentation": "https://docs.example.com"},
            "maintainer": "Team",
            "license": "MIT",
            "classifiers": ["A", "B", "C", "D"],
        }
        assert tf.health_report(d, NOW_TS)["health_score"] == 100

    def test_zero_score(self):
        assert tf.health_report({"name": "empty-package"}, NOW_TS)["health_score"] == 0

    def test_medium_score(self):
        d = {
            "upload_timestamp": days_ago_iso(2000),
            "docs_url": "https://docs.example.com",
            "description": "A" * 151
            + '<img src="https://example.com/screenshot.png" width="400">',
            "project_urls": {"Documentation": "https://docs.example.com"},
            "maintainer": "Team",
            "license": "MIT",
            "classifiers": ["A", "B", "C"],
        }
        # 0 recency + 30 docs + 30 metadata
        assert tf.health_report(d, NOW_TS)["health_score"] == 60

    def test_recent_but_poor_metadata(self):
        d = {"upload_timestamp": NOW_TS, "description": "Short"}
        assert tf.health_report(d, NOW_TS)["health_score"] == 40

    def test_breakdown_structure(self):
        # reference :118-151 — factors, max_points, and sum-to-total
        rep = tf.health_report({"maintainer": "Team"}, NOW_TS)
        bd = rep["health_score_breakdown"]
        assert set(bd) == {"recency", "documentation", "metadata"}
        for factor in bd.values():
            assert set(factor) == {"points", "max_points", "problems", "bonuses"}
        assert bd["recency"]["max_points"] == 40
        assert bd["documentation"]["max_points"] == 18
        assert bd["metadata"]["max_points"] == 30
        assert (
            sum(f["points"] for f in bd.values()) == rep["health_score"]
        )

    def test_consistency_on_multiple_calls(self):
        d = {"name": "test", "maintainer": "Team"}
        assert (
            tf.health_report(d, NOW_TS)["health_score"]
            == tf.health_report(d, NOW_TS)["health_score"]
        )


class TestGithubBonusBoundaries:
    # reference test_health_score.py:1469-1560 (health_calculator tiers,
    # exact boundary values on both sides)
    def test_stars_bonus_boundaries(self):
        for stars, bonus in [
            (1000, 10), (5000, 10), (999, 7), (500, 7), (499, 5),
            (100, 5), (99, 3), (50, 3), (49, 1), (10, 1), (9, 0), (0, 0),
        ]:
            assert tf._stars_bonus(stars) == bonus, stars

    def test_activity_bonus_boundaries(self):
        for days, bonus in [
            (1, 10), (29, 10), (31, 7), (89, 7), (91, 5), (179, 5),
            (181, 3), (364, 3), (366, 0),
        ]:
            assert tf._activity_bonus(NOW_TS - days * 86400, NOW_TS) == bonus, days
        assert tf._activity_bonus(None, NOW_TS) == 0
        assert tf._activity_bonus("not-a-timestamp", NOW_TS) == 0

    def test_issue_bonus_boundaries(self):
        for issues, stars, bonus in [
            (5, 100, 10),   # 0.05 excellent
            (20, 100, 7),   # 0.2 good
            (40, 100, 5),   # 0.4 fair
            (80, 100, 3),   # 0.8 poor
            (150, 100, 0),  # 1.5 very poor
            (10, 0, 0),     # zero stars
        ]:
            assert tf._issue_bonus(issues, stars) == bonus, (issues, stars)
        assert tf._issue_bonus("bad", 100) == 0
        assert tf._issue_bonus(None, 100) == 0


class TestFullPipelineScenarios:
    # reference test_health_score.py:996-1414 — realistic composite docs
    def test_real_world_package(self):
        d = {
            "name": "plone.api",
            "version": "2.0.3",
            "upload_timestamp": NOW_TS - 30 * 86400,
            "docs_url": "https://ploneapi.readthedocs.io/en/latest/",
            "description": (
                "plone.api is an elegant and simple API for Plone. "
                "It provides a high-level API to access Plone functionality. "
                "The goal is to make working with Plone easier."
                '<img src="https://example.com/screenshot.png" width="400">'
            ),
            "project_urls": {
                "Documentation": "https://ploneapi.readthedocs.io/",
                "Source": "https://github.com/plone/plone.api",
                "Tracker": "https://github.com/plone/plone.api/issues",
            },
            "maintainer": "Plone Foundation",
            "author": "Plone Team",
            "license": "GPL version 2",
            "classifiers": [
                "Development Status :: 5 - Production/Stable",
                "Framework :: Plone",
                "Framework :: Plone :: 6.0",
                "Programming Language :: Python",
                "Programming Language :: Python :: 3.8",
                "Programming Language :: Python :: 3.9",
                "Programming Language :: Python :: 3.10",
            ],
        }
        rep = tf.health_report(d, NOW_TS)
        bd = rep["health_score_breakdown"]
        assert bd["recency"]["points"] == 40
        assert bd["documentation"]["points"] == 30  # 4 + 18 + 3 + 5
        assert bd["metadata"]["points"] == 30
        reasons = [b["reason"] for b in bd["documentation"]["bonuses"]]
        assert "has dedicated docs URL" in reasons
        assert "has documentation project URL" in reasons
        assert "has meaningful screenshots" in reasons
        assert rep["health_score"] == 100

    def test_legacy_package_minimal_metadata(self):
        d = {
            "name": "Products.PloneFormGen",
            "upload_timestamp": NOW_TS - 1500 * 86400,
            "description": "A form generator for Plone",
            "author": "Plone Community",
            "classifiers": ["Framework :: Plone"],
        }
        rep = tf.health_report(d, NOW_TS)
        bd = rep["health_score_breakdown"]
        assert bd["recency"]["points"] == 5
        assert bd["documentation"]["points"] == 0
        assert bd["metadata"]["points"] == 10
        assert rep["health_score"] == 15

    def test_brand_new_incomplete(self):
        d = {
            "name": "experimental.plone.feature",
            "upload_timestamp": NOW_TS,
            "description": "Experimental feature",
            "author": "Developer",
        }
        rep = tf.health_report(d, NOW_TS)
        assert rep["health_score_breakdown"]["recency"]["points"] == 40
        assert rep["health_score"] == 50

    def test_well_documented_but_old(self):
        d = {
            "name": "collective.easyform",
            "upload_timestamp": NOW_TS - 729 * 86400,
            "docs_url": "https://collectiveeasyform.readthedocs.io/",
            "description": (
                "collective.easyform enables creation of custom forms through-the-web. "
                "It provides a powerful form builder with validation, custom actions, "
                "and a variety of field types. Extensive documentation available online."
                '<img src="https://example.com/screenshot.png" width="400">'
            ),
            "project_urls": {
                "Documentation": "https://collectiveeasyform.readthedocs.io/",
                "Source": "https://github.com/collective/collective.easyform",
            },
            "maintainer": "Collective Contributors",
            "license": "GPL version 2",
            "classifiers": [
                "Framework :: Plone",
                "Framework :: Plone :: 5.2",
                "Framework :: Plone :: 6.0",
                "Programming Language :: Python :: 3",
            ],
        }
        rep = tf.health_report(d, NOW_TS)
        bd = rep["health_score_breakdown"]
        assert bd["recency"]["points"] == 20
        assert bd["documentation"]["points"] == 30
        assert bd["metadata"]["points"] == 30
        assert rep["health_score"] == 80

    def test_scoring_boundaries(self):
        d = {
            "name": "boundary.test",
            "upload_timestamp": NOW_TS - 180 * 86400,
            "description": "A" * 100,
            "classifiers": ["A", "B"],
        }
        rep = tf.health_report(d, NOW_TS)
        bd = rep["health_score_breakdown"]
        assert bd["recency"]["points"] == 30
        assert bd["documentation"]["points"] == 0
        assert bd["metadata"]["points"] == 0
        assert rep["health_score"] == 30

    def test_all_edge_cases_simultaneously(self):
        d = {
            "name": "edge.case.package",
            "upload_timestamp": None,
            "docs_url": "",
            "description": None,
            "project_urls": {},
            "maintainer": "",
            "author": None,
            "license": None,
            "classifiers": [],
        }
        rep = tf.health_report(d, NOW_TS)
        assert rep["health_score"] == 0
        for factor in rep["health_score_breakdown"].values():
            assert factor["points"] == 0

    def test_large_data_scores_fast_and_correct(self):
        import time as _time

        d = {
            "name": "large.package",
            "upload_timestamp": NOW_TS,
            "docs_url": "https://docs.example.com",
            "description": "A" * 10000
            + '<img src="https://example.com/screenshot.png" width="400">',
            "project_urls": {
                "Documentation": "https://docs.example.com",
                **{f"URL{i}": f"https://url{i}.com" for i in range(100)},
            },
            "maintainer": "Team",
            "license": "MIT",
            "classifiers": [f"Classifier :: {i}" for i in range(100)],
        }
        start = _time.time()
        rep = tf.health_report(d, NOW_TS)
        assert _time.time() - start < 1.0
        assert rep["health_score"] == 100

    def test_independent_and_idempotent(self):
        a = {"upload_timestamp": NOW_TS, "author": "x"}
        b = {"upload_timestamp": NOW_TS - 400 * 86400, "license": "MIT"}
        ra1, rb = tf.health_report(a, NOW_TS), tf.health_report(b, NOW_TS)
        ra2 = tf.health_report(a, NOW_TS)
        assert ra1 == ra2
        assert ra1["health_score"] != rb["health_score"]
