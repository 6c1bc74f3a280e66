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


def days_ago_ts(days: int) -> int:
    return NOW_TS - days * 86400


class TestEnhancedHealthReport:
    """Reference enricher's _calculate_enhanced_health_score
    (test_health_score.py:1602-1738, enrichers/health_calculator.py:
    104-223): conditional GitHub-bonus breakdown keys, 100 cap,
    activity problems folded into recency, issue bonus gated on both
    keys + stars > 0."""

    FULL_BASE = {
        "upload_timestamp": days_ago_ts(30),  # 40 points
        "docs_url": "https://docs.example.com",  # +4
        "description": "A" * 151
        + '<img src="https://example.com/screenshot.png" width="400">',
        "project_urls": {"Documentation": "https://docs.example.com"},  # +3
        "maintainer": "Team",  # 10
        "license": "MIT",  # 10
        "classifiers": ["A", "B", "C"],  # 10
    }

    def test_with_github_data(self):
        # test_health_score.py:1602-1639
        data = dict(
            self.FULL_BASE,
            github_stars=500,  # +7
            github_updated=days_ago_ts(20),  # +10
            github_open_issues=10,  # 0.02 ratio -> +10
        )
        result = tf.enhanced_health_report(data, NOW_TS)
        assert result["health_score"] == 100
        bd = result["health_score_breakdown"]
        for key in (
            "github_stars_bonus",
            "github_activity_bonus",
            "github_issue_bonus",
            "github_bonus_total",
        ):
            assert key in bd
        assert bd["recency"]["points"] == 40
        assert bd["documentation"]["points"] == 30
        assert bd["metadata"]["points"] == 30

    def test_capped_at_100(self):
        # test_health_score.py:1641-1666
        data = dict(
            self.FULL_BASE,
            upload_timestamp=NOW_TS,
            github_stars=2000,  # +10
            github_updated=days_ago_ts(10),  # +10
            github_open_issues=5,  # 0.0025 -> +10
        )
        result = tf.enhanced_health_report(data, NOW_TS)
        assert result["health_score"] == 100  # capped, not 130
        assert result["health_score_breakdown"]["github_bonus_total"] == 30

    def test_minimal_data(self):
        # test_health_score.py:1668-1683
        result = tf.enhanced_health_report(
            {"name": "test-package", "version": "1.0.0"}, NOW_TS
        )
        assert result["health_score"] == 0
        bd = result["health_score_breakdown"]
        assert bd["recency"]["points"] == 0
        assert bd["documentation"]["points"] == 0
        assert bd["metadata"]["points"] == 0

    def test_partial_github_data(self):
        # test_health_score.py:1685-1705: stars only -> stars key
        # present, activity key absent
        data = {
            "upload_timestamp": days_ago_ts(400),  # 20 points
            "maintainer": "Team",  # 10 points
            "github_stars": 100,  # +5
        }
        result = tf.enhanced_health_report(data, NOW_TS)
        assert result["health_score"] == 35
        bd = result["health_score_breakdown"]
        assert "github_stars_bonus" in bd
        assert "github_activity_bonus" not in bd

    def test_no_github_data(self):
        # test_health_score.py:1707-1738
        data = {
            "upload_timestamp": NOW_TS,  # 40
            "maintainer": "Team",
            "license": "MIT",
            "classifiers": ["A", "B", "C"],  # 30 metadata
        }
        result = tf.enhanced_health_report(data, NOW_TS)
        assert result["health_score"] == 70
        bd = result["health_score_breakdown"]
        for key in (
            "github_stars_bonus",
            "github_activity_bonus",
            "github_issue_bonus",
            "github_bonus_total",
        ):
            assert key not in bd

    def test_last_calculated_is_injected_now(self):
        # reference stamps time.time() (health_calculator.py:221);
        # deterministic now_ts here
        result = tf.enhanced_health_report({}, NOW_TS)
        assert result["health_score_last_calculated"] == NOW_TS


class TestEnricherProblemsIntegration:
    """Reference test_health_score.py:2020-2203 — GitHub-derived
    problem/bonus strings folded into the base breakdown."""

    def test_problems_with_github_ones(self):
        # test_health_score.py:2020-2063
        data = {
            "upload_timestamp": days_ago_ts(400),
            "description": "Short",
            "maintainer": "Team",
            "github_stars": 100,
            "github_updated": days_ago_ts(400),  # stale -> activity 0
            "github_open_issues": 200,  # 2.0 ratio: no bonus, no problem
        }
        result = tf.enhanced_health_report(data, NOW_TS)
        bd = result["health_score_breakdown"]
        assert DOC_PROBLEM in bd["documentation"]["problems"]
        assert "no license" in bd["metadata"]["problems"]
        assert "last release over 1 year ago" in bd["recency"]["problems"]
        assert "no GitHub activity in 1+ year" in bd["recency"]["problems"]

    def test_github_problems_calculated_once(self):
        # test_health_score.py:2065-2088
        data = {
            "upload_timestamp": days_ago_ts(400),
            "maintainer": "Team",
            "github_stars": 100,
            "github_updated": days_ago_ts(400),
            "github_open_issues": 200,
        }
        problems = tf.enhanced_health_report(data, NOW_TS)[
            "health_score_breakdown"
        ]["recency"]["problems"]
        assert problems.count("no GitHub activity in 1+ year") == 1

    def test_limited_activity_problem(self):
        # test_health_score.py:2090-2113: 200 days -> bonus 3 + problem
        data = {
            "upload_timestamp": NOW_TS,
            "maintainer": "Team",
            "github_stars": 100,
            "github_updated": days_ago_ts(200),
            "github_open_issues": 10,
        }
        result = tf.enhanced_health_report(data, NOW_TS)
        bd = result["health_score_breakdown"]
        assert bd["github_activity_bonus"] == 3
        assert "limited GitHub activity (6+ months)" in bd["recency"]["problems"]

    def test_good_issue_management_bonus(self):
        # test_health_score.py:2115-2137: ratio 0.1 -> bonus 7 + string
        data = {
            "upload_timestamp": NOW_TS,
            "maintainer": "Team",
            "github_stars": 100,
            "github_updated": days_ago_ts(10),
            "github_open_issues": 10,
        }
        result = tf.enhanced_health_report(data, NOW_TS)
        bd = result["health_score_breakdown"]
        assert bd["github_issue_bonus"] == 7
        assert "good issue management" in bd["metadata"]["bonuses"]

    def test_no_issue_bonus_message_for_poor_ratio(self):
        # test_health_score.py:2139-2165: ratio 2.0 -> key absent,
        # neither a problem nor a bonus string
        data = {
            "upload_timestamp": NOW_TS,
            "maintainer": "Team",
            "github_stars": 100,
            "github_updated": days_ago_ts(10),
            "github_open_issues": 200,
        }
        result = tf.enhanced_health_report(data, NOW_TS)
        bd = result["health_score_breakdown"]
        assert "github_issue_bonus" not in bd
        assert (
            "high open issues to stars ratio (>1.0)"
            not in bd["metadata"]["problems"]
        )
        assert "good issue management" not in bd["metadata"]["bonuses"]

    def test_no_issue_bonus_message_for_marginal_ratio(self):
        # test_health_score.py:2167-2202: ratio 0.7 -> bonus 3, no string
        data = {
            "upload_timestamp": NOW_TS,
            "maintainer": "Team",
            "github_stars": 100,
            "github_updated": days_ago_ts(10),
            "github_open_issues": 70,
        }
        result = tf.enhanced_health_report(data, NOW_TS)
        bd = result["health_score_breakdown"]
        assert bd["github_issue_bonus"] == 3
        assert (
            "elevated open issues ratio (>0.5)"
            not in bd["metadata"]["problems"]
        )
        assert "good issue management" not in bd["metadata"]["bonuses"]

    def test_issue_bonus_requires_both_keys(self):
        # health_calculator.py:168-180: no github_open_issues key ->
        # no issue bonus even with stars
        data = {
            "upload_timestamp": NOW_TS,
            "github_stars": 2000,
            "github_updated": days_ago_ts(10),
        }
        bd = tf.enhanced_health_report(data, NOW_TS)["health_score_breakdown"]
        assert "github_issue_bonus" not in bd
        assert bd["github_bonus_total"] == 20  # stars 10 + activity 10

    def test_zero_stars_skips_issue_bonus(self):
        # health_calculator.py:171: stars == 0 -> ratio undefined
        data = {
            "upload_timestamp": NOW_TS,
            "github_stars": 0,
            "github_open_issues": 0,
        }
        bd = tf.enhanced_health_report(data, NOW_TS)["health_score_breakdown"]
        assert "github_issue_bonus" not in bd
        assert "github_bonus_total" not in bd


class TestScreenshotBonusAccounting:
    """Reference test_health_score.py:2204-2282 — screenshots are a
    bonus, never a penalty."""

    def test_missing_screenshot_is_not_a_problem(self):
        data = {"description": "A" * 151, "docs_url": "https://docs.example.com"}
        score, problems, bonuses = tf._docs_with_problems(data)
        assert (
            "no meaningful screenshots in documentation" not in problems
        )
        assert not any(
            b["reason"] == "has meaningful screenshots" for b in bonuses
        )

    def test_screenshot_bonus_when_present(self):
        data = {
            "description": "A" * 151
            + '<img src="https://example.com/screenshot.png" width="400">',
            "docs_url": "https://docs.example.com",
        }
        _, _, bonuses = tf._docs_with_problems(data)
        shot = next(
            (b for b in bonuses if b["reason"] == "has meaningful screenshots"),
            None,
        )
        assert shot is not None and shot["points"] == 5

    def test_screenshot_adds_exactly_5(self):
        without = {"description": "A" * 151, "docs_url": "https://docs.example.com"}
        with_shot = dict(
            without,
            description="A" * 151
            + '<img src="https://example.com/screenshot.png" width="400">',
        )
        s0, _, _ = tf._docs_with_problems(without)
        s1, _, _ = tf._docs_with_problems(with_shot)
        assert s1 == s0 + 5

    def test_all_bonuses_tracked(self):
        data = {
            "docs_url": "https://docs.example.com",
            "description": "A" * 151
            + '<img src="https://example.com/screenshot.png" width="400">',
            "project_urls": {"Documentation": "https://docs.example.com"},
        }
        score, _, bonuses = tf._docs_with_problems(data)
        reasons = {b["reason"] for b in bonuses}
        assert reasons == {
            "has dedicated docs URL",
            "has documentation project URL",
            "has meaningful screenshots",
        }
        assert score == 30


class TestNpmMetadataScoring:
    """Reference test_health_score.py:2284-2361 — npm uses keywords
    where pypi uses classifiers."""

    def test_npm_3_keywords_is_10(self):
        data = {"registry": "npm", "keywords": ["volto", "addon", "plone"]}
        assert tf._metadata_score(data) == 10

    def test_npm_fewer_keywords_reports_keyword_problem(self):
        score, problems, _ = tf._metadata_with_problems(
            {"registry": "npm", "keywords": ["volto"]}
        )
        assert score == 0
        assert "fewer than 3 keywords" in problems
        assert "fewer than 3 classifiers" not in problems

    def test_npm_ignores_classifiers(self):
        data = {
            "registry": "npm",
            "classifiers": [],
            "keywords": ["volto", "addon", "plone", "eea"],
        }
        assert tf._metadata_score(data) == 10

    def test_pypi_uses_classifiers_even_with_keywords(self):
        data = {
            "registry": "pypi",
            "classifiers": ["A", "B", "C"],
            "keywords": [],
        }
        assert tf._metadata_score(data) == 10

    def test_default_registry_uses_classifiers(self):
        assert tf._metadata_score({"classifiers": ["A", "B", "C"]}) == 10

    def test_npm_empty_keywords_reports_problem(self):
        score, problems, _ = tf._metadata_with_problems(
            {"registry": "npm", "keywords": []}
        )
        assert score == 0 and "fewer than 3 keywords" in problems

    def test_npm_full_metadata_is_30(self):
        data = {
            "registry": "npm",
            "maintainer": "EEA",
            "license": "MIT",
            "keywords": ["volto", "addon", "plone", "eea"],
        }
        assert tf._metadata_score(data) == 30

    def test_npm_integrated_health_score(self):
        # test_health_score.py:2353-2361: full npm package through the
        # enhanced path
        data = {
            "name": "@eeacms/volto-n2k",
            "registry": "npm",
            "version": "1.0.0",
            "upload_timestamp": NOW_TS,  # 40
            "docs_url": "https://docs.example.com",  # +4
            "description": "A" * 151,  # 18
            "maintainer": "EEA",
            "license": "MIT",
            "keywords": ["volto", "addon", "plone"],  # 30 metadata
        }
        result = tf.enhanced_health_report(data, NOW_TS)
        assert result["health_score"] == 92  # 40 + 22 + 30
        bd = result["health_score_breakdown"]
        assert bd["metadata"]["points"] == 30
        assert "fewer than 3 keywords" not in bd["metadata"]["problems"]


class TestFastPathTotalityAndParity:
    """Round-5 review fixes: the numeric fast path is total on messy
    types and agrees with enhanced_health_report on the issue-bonus
    gate (present-but-None open_issues -> 0, like the reference's
    try/except — not coerced to a perfect ratio)."""

    def test_fast_path_total_on_string_stars(self):
        doc = {"github_stars": "100", "github_open_issues": 5}
        out = tf.health_score(doc, NOW_TS)  # must not raise
        assert out["health_github_bonus"] == 0

    def test_none_open_issues_scores_zero_on_both_paths(self):
        doc = {"github_stars": 10, "github_open_issues": None}
        fast = tf.health_score(doc, NOW_TS)
        enhanced = tf.enhanced_health_report(doc, NOW_TS)
        # stars bonus +1 only; the None ratio earns nothing on either path
        assert fast["health_github_bonus"] == 1
        assert "github_issue_bonus" not in enhanced["health_score_breakdown"]
        assert fast["health_score"] == enhanced["health_score"]

    def test_comma_string_keywords_keep_reference_len_semantics(self):
        # health_score.py:265-311 calls bare len(): a pre-clean comma
        # STRING counts characters (>=3 chars -> the +10)
        score, problems, _ = tf._metadata_with_problems(
            {"registry": "npm", "keywords": "react,hooks,forms"}
        )
        assert score == 10 and "fewer than 3 keywords" not in problems
        score, problems, _ = tf._metadata_with_problems(
            {"registry": "npm", "keywords": "ab"}
        )
        assert score == 0 and "fewer than 3 keywords" in problems

    def test_integer_classifiers_degrade_not_crash(self):
        score, problems, _ = tf._metadata_with_problems({"classifiers": 7})
        assert score == 0 and "fewer than 3 classifiers" in problems
