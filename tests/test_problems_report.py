"""Per-run enrichment problems report: JSON/Markdown shape pinned
against the reference's writer (enrichers/github.py:312-376), plus the
incremental-flush contract of the Ray side artifact."""

import json
import os

import pyarrow as pa

from pyf_aggregator_ray.pipelines import problems as pr


def _mk_doc(**kw):
    base = {"name": "pkg", "home_page": None, "project_urls": None}
    base.update(kw)
    return base


def test_classify_reasons():
    # valid capture -> enriched, no problem
    ident, reason = pr.classify_repo_problem(
        _mk_doc(home_page="https://github.com/plone/plone.api")
    )
    assert (ident, reason) == ("plone/plone.api", None)
    # GitHub-shaped but invalid (reserved owner) -> malformed, RAW capture
    ident, reason = pr.classify_repo_problem(
        _mk_doc(home_page="https://github.com/about/invalid")
    )
    assert (ident, reason) == ("about/invalid", "malformed_identifier")
    # no GitHub-shaped URL anywhere -> no_repo_url
    ident, reason = pr.classify_repo_problem(
        _mk_doc(home_page="https://example.org/x")
    )
    assert (ident, reason) == (None, "no_repo_url")
    # the FIRST matching URL decides: a malformed home_page does NOT
    # fall through to a valid project_urls entry (reference returns its
    # extraction immediately)
    ident, reason = pr.classify_repo_problem(
        _mk_doc(
            home_page="https://github.com/about/invalid",
            project_urls={"Source": "https://github.com/plone/plone.api"},
        )
    )
    assert reason == "malformed_identifier"


def test_candidate_urls_shape():
    doc = _mk_doc(
        home_page="https://example.org",
        repository_url="https://github.com/a/b",
        project_urls={"Docs": "https://docs.example.org"},
    )
    urls = pr.candidate_urls(doc)
    # reference github.py:300-310: field-name keys, project_urls.<key>,
    # empties dropped
    assert urls == {
        "home_page": "https://example.org",
        "repository_url": "https://github.com/a/b",
        "project_urls.Docs": "https://docs.example.org",
    }


PROBLEMS = [
    {
        "name": "beta",
        "repo_identifier": "about/x",
        "reason": "malformed_identifier",
        "urls": {"home_page": "https://github.com/about/x"},
    },
    {
        "name": "alpha",
        "repo_identifier": None,
        "reason": "no_repo_url",
        "urls": {"home_page": "https://example.org/a"},
    },
    {
        "name": "gamma",
        "repo_identifier": "o/r",
        "reason": "not_found",
        "urls": {"url": "https://github.com/o/r"},
    },
]


def test_json_report_structure(tmp_path):
    """Exact reference JSON structure: {"count": N, "problems": [...]},
    indent=2, sort_keys (github.py:330-340)."""
    pr.write_problem_report(PROBLEMS, str(tmp_path))
    raw = (tmp_path / "github_problems.json").read_text()
    data = json.loads(raw)
    assert set(data) == {"count", "problems"}
    assert data["count"] == 3
    assert {p["name"] for p in data["problems"]} == {"alpha", "beta", "gamma"}
    for p in data["problems"]:
        assert set(p) == {"name", "repo_identifier", "reason", "urls"}
    # indent=2 + sorted keys, as the reference writes it
    assert raw == json.dumps(
        {"count": 3, "problems": PROBLEMS}, indent=2, sort_keys=True
    )


def test_markdown_report_structure(tmp_path):
    """Grouped-by-reason Markdown: sections in label order, entries
    sorted by name, 3-column table, <br>-joined urls
    (github.py:349-376)."""
    pr.write_problem_report(PROBLEMS, str(tmp_path))
    md = (tmp_path / "github_problems.md").read_text()
    lines = md.splitlines()
    assert lines[0] == "# Problematic GitHub Repositories"
    assert lines[2] == "Total: 3"
    # section order follows PROBLEM_REASON_LABELS, not input order
    sec_idx = [i for i, ln in enumerate(lines) if ln.startswith("## ")]
    assert [lines[i] for i in sec_idx] == [
        "## No GitHub URL in package metadata (1)",
        "## Malformed repository identifier (1)",
        "## Repository not found (404) (1)",
    ]
    assert "| Package | Repo identifier | URLs |" in lines
    assert "| alpha |  | home_page: https://example.org/a |" in lines
    assert "| beta | about/x | home_page: https://github.com/about/x |" in lines


def test_no_problems_writes_nothing(tmp_path):
    pr.write_problem_report([], str(tmp_path))
    assert not (tmp_path / "github_problems.json").exists()
    assert not (tmp_path / "github_problems.md").exists()


def test_stage_flushes_incrementally(tmp_path):
    """Each batch flush leaves a VALID aggregate report on disk (the
    reference flushes after every recorded problem so a hard-killed run
    still reports everything recorded so far)."""
    stage = pr.ProblemReportStage(str(tmp_path))
    b1 = pa.table(
        {"name": ["p1"], "home_page": ["https://github.com/about/x"]}
    )
    out = stage(b1)
    assert out.equals(b1)  # pass-through
    data1 = json.loads((tmp_path / "github_problems.json").read_text())
    assert data1["count"] == 1
    b2 = pa.table({"name": ["p2"], "home_page": ["https://example.org"]})
    stage(b2)
    data2 = json.loads((tmp_path / "github_problems.json").read_text())
    assert data2["count"] == 2
    assert {p["reason"] for p in data2["problems"]} == {
        "malformed_identifier",
        "no_repo_url",
    }
    # finalize is idempotent
    probs = pr.finalize_problem_report(str(tmp_path))
    assert len(probs) == 2


def test_pipeline_side_artifact(ray_session, tmp_path):
    """The package enrich chain side-writes the report; the fixture's
    reserved-owner URLs ('https://github.com/about/invalid', every 6th
    package) surface as malformed_identifier rows."""
    out = pr.package_transform_with_report("/root/testdata/sf0.001", str(tmp_path))
    assert out is not None and out.num_rows == 24
    data = json.loads((tmp_path / "github_problems.json").read_text())
    assert data["count"] == len(data["problems"]) > 0
    assert all(
        p["reason"] == "malformed_identifier" and p["repo_identifier"] == "about/invalid"
        for p in data["problems"]
    )
    md = (tmp_path / "github_problems.md").read_text()
    assert md.startswith("# Problematic GitHub Repositories")
    assert f"Total: {data['count']}" in md


def test_report_survives_interrupted_run(ray_session, tmp_path):
    """The reference flushes the report in `finally` so an interrupted
    run still reports everything recorded (github.py:284-296). Kill the
    pipeline after the report stage flushed a batch: the aggregate
    report on disk stays valid and finalize re-renders it."""
    import ray
    import ray.data

    stage_dir = str(tmp_path)
    b = pa.table({"name": ["p1"], "home_page": ["https://github.com/about/x"]})

    def boom(t: pa.Table) -> pa.Table:
        raise RuntimeError("simulated mid-run crash")

    try:
        ds = (
            ray.data.from_arrow(b)
            .map_batches(
                pr.ProblemReportStage,
                fn_constructor_args=(stage_dir,),
                batch_format="pyarrow",
                concurrency=1,
            )
            .map_batches(boom, batch_format="pyarrow")
        )
        try:
            ds.materialize()
        finally:
            probs = pr.finalize_problem_report(stage_dir)
    except Exception:
        pass
    data = json.loads((tmp_path / "github_problems.json").read_text())
    assert data["count"] == 1
    assert data["problems"][0]["reason"] == "malformed_identifier"


def test_profile_run_side_writes_report(ray_session, tmp_path):
    """The profile-driven package run (reference `pyfa pypi -p`) can
    side-write the problems report like the reference enricher runs do;
    the result carries the count."""
    from pyf_aggregator_ray.pipelines.packagepipe import profile_package_run

    out = profile_package_run("plone", report_dir=str(tmp_path))
    assert out["n_problems"] >= 0
    if out["n_problems"]:
        data = json.loads((tmp_path / "github_problems.json").read_text())
        assert data["count"] == out["n_problems"]


class TestNotFoundFallback:
    """Reference test_github_enricher.py:727-830 — the 404 fallback
    across versions, over the sandbox's repo-exists set."""

    NEWEST = {
        "id": "my.pkg-2.0.0",
        "name": "my.pkg",
        "upload_timestamp": 200,
        "home_page": "https://github.com/old-org/my.pkg",
    }
    OLDER = {
        "id": "my.pkg-1.0.0",
        "name": "my.pkg",
        "upload_timestamp": 100,
        "home_page": "https://github.com/new-org/my.pkg",
    }

    def test_falls_back_to_working_repo_from_other_version(self):
        exists = {"new-org/my.pkg"}.__contains__
        res = pr.resolve_repo_with_fallback([self.OLDER, self.NEWEST], exists)
        assert res["resolved"] is True
        assert res["fallback"] is True
        assert res["repo_identifier"] == "new-org/my.pkg"
        assert res["reason"] is None

    def test_records_not_found_when_no_version_resolves(self):
        res = pr.resolve_repo_with_fallback(
            [self.OLDER, self.NEWEST], lambda _: False
        )
        assert res["resolved"] is False
        assert res["reason"] == "not_found"
        # the originally-resolved (newest) identifier is reported
        assert res["repo_identifier"] == "old-org/my.pkg"

    def test_primary_resolving_needs_no_fallback(self):
        exists = {"old-org/my.pkg", "new-org/my.pkg"}.__contains__
        res = pr.resolve_repo_with_fallback([self.NEWEST, self.OLDER], exists)
        assert res["resolved"] is True and res["fallback"] is False
        assert res["repo_identifier"] == "old-org/my.pkg"

    def test_newest_version_decides_primary_regardless_of_order(self):
        # input order must not matter — upload_timestamp does
        res = pr.resolve_repo_with_fallback(
            [self.OLDER, self.NEWEST], lambda _: False
        )
        assert res["repo_identifier"] == "old-org/my.pkg"

    def test_malformed_identifier_never_falls_back(self):
        # github.py:207-220: malformed continues before any GitHub call
        newest = {
            "name": "my.pkg",
            "upload_timestamp": 300,
            "home_page": "https://github.com/orgs/my.pkg",  # reserved owner
        }
        res = pr.resolve_repo_with_fallback(
            [self.OLDER, newest], {"new-org/my.pkg"}.__contains__
        )
        assert res["resolved"] is False
        assert res["reason"] == "malformed_identifier"

    def test_no_repo_url_when_no_github_shaped_url(self):
        res = pr.resolve_repo_with_fallback(
            [{"name": "my.pkg", "upload_timestamp": 1,
              "home_page": "https://example.com/my.pkg"}],
            lambda _: True,
        )
        assert res["reason"] == "no_repo_url"
        assert res["repo_identifier"] is None

    def test_fallback_walks_newest_first_and_dedups_tried(self):
        calls = []

        def exists(ident):
            calls.append(ident)
            return ident == "c/r"

        versions = [
            {"name": "p", "upload_timestamp": 4,
             "home_page": "https://github.com/a/r"},  # primary, 404
            {"name": "p", "upload_timestamp": 3,
             "home_page": "https://github.com/a/r"},  # same as tried — skipped
            {"name": "p", "upload_timestamp": 2,
             "home_page": "https://github.com/b/r"},  # 404
            {"name": "p", "upload_timestamp": 1,
             "home_page": "https://github.com/c/r"},  # works
        ]
        res = pr.resolve_repo_with_fallback(versions, exists)
        assert res["repo_identifier"] == "c/r" and res["fallback"] is True
        assert calls == ["a/r", "b/r", "c/r"]


def test_distributed_fallback_resolution(ray_session):
    """resolve_repos_with_fallback: one output row per package, the
    known-repo set broadcast once, packages bucket-grouped."""
    import ray.data

    docs = []
    for name, org_by_version in [
        ("pkg.a", {2: "live-org", 1: "dead-org"}),      # primary resolves
        ("pkg.b", {2: "dead-org", 1: "live-org"}),      # falls back
        ("pkg.c", {2: "dead-org", 1: "gone-org"}),      # not found
    ]:
        for ver, org in org_by_version.items():
            docs.append(
                {
                    "name": name,
                    "upload_timestamp": ver,
                    "home_page": f"https://github.com/{org}/{name}",
                }
            )
    docs.append({"name": "pkg.d", "upload_timestamp": 1,
                 "home_page": "https://example.com/x"})  # no repo url
    known = {"live-org/pkg.a", "live-org/pkg.b"}
    out = (
        pr.resolve_repos_with_fallback(ray.data.from_items(docs), known)
        .to_pandas()
        .set_index("name")
        .sort_index()
    )
    assert len(out) == 4
    assert out.loc["pkg.a", "resolved"] and not out.loc["pkg.a", "fallback"]
    assert out.loc["pkg.a", "repo_identifier"] == "live-org/pkg.a"
    assert out.loc["pkg.b", "resolved"] and out.loc["pkg.b", "fallback"]
    assert out.loc["pkg.b", "repo_identifier"] == "live-org/pkg.b"
    assert not out.loc["pkg.c", "resolved"]
    assert out.loc["pkg.c", "reason"] == "not_found"
    assert out.loc["pkg.c", "repo_identifier"] == "dead-org/pkg.c"
    assert out.loc["pkg.d", "reason"] == "no_repo_url"
