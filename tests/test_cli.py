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
