"""CLI surface: argument wiring and Ray-free subcommands via subprocess
(the full build/query/curate paths are smoke-run in their own suites)."""

import json
import os
import subprocess
import sys


def _run(*args: str) -> dict:
    out = subprocess.run(
        [sys.executable, "-m", "pyf_aggregator_ray.cli", *args],
        capture_output=True,
        text=True,
        check=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ).stdout
    return json.loads(out.strip().splitlines()[-1])


def test_profiles_list_and_show():
    listed = _run("profiles")
    assert listed == {"profiles": ["django", "flask", "plone"]}
    shown = _run("profiles", "--profile", "plone")
    assert shown["target"] == "plone"
    assert "Framework :: Plone" in shown["classifiers"]
    assert shown["npm"]["scopes"] == ["@plone"]


def test_gc_on_empty_root(tmp_path):
    out = _run("gc", "--index-root", str(tmp_path / "nothing"))
    assert out == {"removed_versions": []}


def test_unknown_subcommand_fails():
    r = subprocess.run(
        [sys.executable, "-m", "pyf_aggregator_ray.cli", "nope"],
        capture_output=True,
        text=True,
    )
    assert r.returncode != 0


def test_search_subcommand(ray_session):
    """The composed-search CLI returns the facade's rows (JSON records)
    with pagination + snippets flags honored. Runs in a subprocess with
    its own Ray session (the CLI owns init/shutdown)."""
    out = _run(
        "search", "--sf-dir", "/root/testdata/sf0.001",
        "--query", "merge sort", "-k", "3", "--page", "2",
        "--filter-by", "lang:=en", "--snippets",
    )
    assert isinstance(out, list)
    for row in out:
        assert {"rank", "doc_id", "score", "first_pos", "snippet"} <= set(row)
    if out:
        assert out[0]["rank"] == 4  # global ranks, page-2 window
