"""Screenshot-detector goldens ported from the reference suite
(/root/reference/tests/test_screenshot_detector.py): badge-URL
patterns, width parsing from attribute/style, and full detection over
HTML fixtures. The reference's network fetch fallback is out of scope
(no network in this engine) — those mock-based cases are represented by
the decidable halves: relative no-width images are never counted."""

from pyf_aggregator_ray.functions.transforms import (
    MIN_SCREENSHOT_WIDTH,
    detect_screenshots,
    is_badge_url,
    parse_width_from_attribute,
    parse_width_from_style,
)


class TestIsBadgeUrl:
    # reference test_screenshot_detector.py:33-117
    def test_badge_services(self):
        for url in (
            "https://shields.io/badge/foo-bar",
            "https://img.shields.io/badge/foo-bar.svg",
            "https://img.shields.io/pypi/v/package.svg",
            "https://badge.fury.io/py/package.svg",
            "https://travis-ci.org/user/repo.svg",
            "https://travis-ci.com/user/repo.svg",
            "https://codecov.io/gh/user/repo/branch/main/graph/badge.svg",
            "https://coveralls.io/repos/github/user/repo/badge.svg",
            "https://circleci.com/gh/user/repo.svg",
            "https://github.com/user/repo/workflows/CI/badge.svg",
            "https://github.com/user/repo/actions/workflows/test.yml/badge.svg",
            "https://readthedocs.org/projects/package/badge/",
            "https://pypi.org/badges/package/v/1.0.0",
            "https://pypi.python.org/static/badge.svg",
            "https://ci.appveyor.com/api/projects/status/...",
            "https://snyk.io/test/github/user/repo/badge.svg",
            "https://codacy.com/project/badge/grade/...",
            "https://sonarcloud.io/api/project_badges/...",
            "https://example.com/some-badge.svg",  # generic fallback
        ):
            assert is_badge_url(url), url

    def test_not_badge_url(self):
        for url in (
            "https://example.com/screenshot.png",
            "https://example.com/images/demo.jpg",
            "https://github.com/user/repo/raw/main/docs/screenshot.png",
            "",
            None,
        ):
            assert not is_badge_url(url), url


class TestParseWidthFromStyle:
    # reference :120-151
    def test_vectors(self):
        assert parse_width_from_style("width: 300px") == 300
        assert parse_width_from_style("width:300px") == 300
        assert parse_width_from_style("width: 300px;") == 300
        assert parse_width_from_style("width: 300") == 300
        assert parse_width_from_style("width:300") == 300
        assert (
            parse_width_from_style("height: 200px; width: 400px; border: 1px")
            == 400
        )
        assert parse_width_from_style("margin: 10px; width: 500px") == 500
        assert parse_width_from_style("WIDTH: 300px") == 300
        assert parse_width_from_style("Width: 300px") == 300
        assert parse_width_from_style("") is None
        assert parse_width_from_style(None) is None
        assert parse_width_from_style("height: 200px") is None
        assert parse_width_from_style("color: red") is None


class TestParseWidthFromAttribute:
    # reference :155-179
    def test_vectors(self):
        assert parse_width_from_attribute("300") == 300
        assert parse_width_from_attribute("500") == 500
        assert parse_width_from_attribute("300px") == 300
        assert parse_width_from_attribute("500px") == 500
        assert parse_width_from_attribute(" 300 ") == 300
        assert parse_width_from_attribute("300 ") == 300
        assert parse_width_from_attribute("") is None
        assert parse_width_from_attribute(None) is None
        assert parse_width_from_attribute("auto") is None
        assert parse_width_from_attribute("100%") is None
        assert parse_width_from_attribute("abc") is None


class TestDetectScreenshots:
    # reference :312-456
    def test_no_images(self):
        result = detect_screenshots("<div><p>Hello World</p></div>")
        assert result["has_screenshots"] is False
        assert result["screenshot_count"] == 0
        assert result["screenshots"] == []

    def test_only_badges(self):
        html = """
        <div>
            <img src="https://img.shields.io/badge/python-3.9-blue.svg" width="100">
            <img src="https://codecov.io/gh/user/repo/badge.svg" width="150">
        </div>
        """
        result = detect_screenshots(html)
        assert result["has_screenshots"] is False
        assert result["screenshot_count"] == 0

    def test_screenshot_with_width_attribute(self):
        html = '<div><img src="https://example.com/screenshot.png" width="400"></div>'
        result = detect_screenshots(html)
        assert result["has_screenshots"] is True
        assert result["screenshot_count"] == 1
        assert "https://example.com/screenshot.png" in result["screenshots"]

    def test_screenshot_with_style_width(self):
        html = '<div><img src="https://example.com/screenshot.png" style="width: 500px"></div>'
        result = detect_screenshots(html)
        assert result["has_screenshots"] is True
        assert result["screenshot_count"] == 1

    def test_width_attribute_takes_priority(self):
        # reference :267-277 — attribute wins over style
        html = '<img src="https://example.com/s.png" width="100" style="width: 500px">'
        assert detect_screenshots(html)["has_screenshots"] is False
        html = '<img src="https://example.com/s.png" width="500" style="width: 100px">'
        assert detect_screenshots(html)["has_screenshots"] is True

    def test_small_image_filtered(self):
        html = """
        <div>
            <img src="https://example.com/icon.png" width="50">
            <img src="https://example.com/thumb.png" width="100">
        </div>
        """
        result = detect_screenshots(html)
        assert result["has_screenshots"] is False

    def test_mixed_content(self):
        html = """
        <div>
            <img src="https://img.shields.io/badge/test-passing.svg" width="100">
            <img src="https://example.com/icon.png" width="32">
            <img src="https://example.com/screenshot1.png" width="400">
            <img src="https://example.com/screenshot2.png" width="600">
            <img src="https://codecov.io/badge.svg" width="80">
        </div>
        """
        result = detect_screenshots(html)
        assert result["has_screenshots"] is True
        assert result["screenshot_count"] == 2
        assert "https://example.com/screenshot1.png" in result["screenshots"]
        assert "https://example.com/screenshot2.png" in result["screenshots"]

    def test_degenerate_inputs(self):
        for content in ("", None, "<not valid xml"):
            result = detect_screenshots(content)
            assert result["has_screenshots"] is False
            assert result["screenshot_count"] == 0

    def test_image_without_src(self):
        assert detect_screenshots('<img width="400">')["has_screenshots"] is False
        assert (
            detect_screenshots('<img src="" width="400">')["has_screenshots"]
            is False
        )

    def test_boundary_widths(self):
        at = f'<img src="https://example.com/image.png" width="{MIN_SCREENSHOT_WIDTH}">'
        below = f'<img src="https://example.com/image.png" width="{MIN_SCREENSHOT_WIDTH - 1}">'
        assert detect_screenshots(at)["screenshot_count"] == 1
        assert detect_screenshots(below)["screenshot_count"] == 0

    def test_relative_url_without_width_not_counted(self):
        # reference :293-308 — no fetch for relative URLs -> width
        # undeterminable -> never counted
        assert (
            detect_screenshots('<img src="docs/screenshot.png">')[
                "has_screenshots"
            ]
            is False
        )

    def test_real_readme_scenario(self):
        # reference :460-489
        html = """
        <h1>My Package</h1>
        <p>
            <a href="https://pypi.org/project/mypackage">
                <img src="https://img.shields.io/pypi/v/mypackage.svg" alt="PyPI version">
            </a>
            <a href="https://github.com/user/mypackage/actions">
                <img src="https://github.com/user/mypackage/workflows/CI/badge.svg" alt="CI">
            </a>
        </p>
        <h2>Screenshots</h2>
        <p>
            <img src="https://raw.githubusercontent.com/user/mypackage/main/docs/screenshot.png"
                 alt="Screenshot" width="800">
        </p>
        <h2>Demo</h2>
        <p>
            <img src="https://example.com/demo.gif" style="width: 600px; border: 1px solid #ccc">
        </p>
        """
        result = detect_screenshots(html)
        assert result["has_screenshots"] is True
        assert result["screenshot_count"] == 2
        assert not any("shields.io" in url for url in result["screenshots"])
        assert not any("badge.svg" in url for url in result["screenshots"])
