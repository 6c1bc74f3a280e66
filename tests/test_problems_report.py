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
