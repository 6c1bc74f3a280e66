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


class TestRecreateConfirmation:
    """Reference test_typesense_util.py:495-657 — the recreate CLI's
    deletion confirmation: default Yes, 'n' keeps, --force skips the
    prompt, --keep-old never asks."""

    def _decide(self, keep_old=False, force=False, answer=None):
        from pyf_aggregator_ray.cli import _confirm_delete_old

        asked = []

        def ask(prompt):
            asked.append(prompt)
            return answer if answer is not None else ""

        decided = _confirm_delete_old(keep_old, force, "v001", ask=ask)
        return decided, asked

    def test_confirmation_yes_deletes(self):
        deleted, asked = self._decide(answer="y")
        assert deleted is True and len(asked) == 1

    def test_confirmation_empty_deletes(self):
        # Enter = default Yes
        deleted, asked = self._decide(answer="")
        assert deleted is True and len(asked) == 1

    def test_confirmation_no_keeps(self):
        deleted, asked = self._decide(answer="n")
        assert deleted is False
        deleted, _ = self._decide(answer="N")
        assert deleted is False

    def test_force_skips_confirmation(self):
        deleted, asked = self._decide(force=True, answer="n")
        assert deleted is True and asked == []

    def test_keep_old_never_asks(self):
        deleted, asked = self._decide(keep_old=True, force=True)
        assert deleted is False and asked == []

    def test_prompt_names_the_version(self):
        _, asked = self._decide(answer="y")
        assert "v001" in asked[0]


def test_delete_index_version_guards_live(tmp_path):
    """delete_index_version refuses the live alias target and reports
    missing dirs; a retired dir really goes away."""
    from pyf_aggregator_ray.pipelines.maintenance import delete_index_version
    from pyf_aggregator_ray.state import manifest as mf

    root = str(tmp_path)
    old = mf.version_dir(root, 1)
    new = mf.version_dir(root, 2)
    os.makedirs(old)
    os.makedirs(new)
    mf.switch_alias(root, 2)

    import pytest

    with pytest.raises(ValueError):
        delete_index_version(root, new)
    assert delete_index_version(root, old) is True
    assert not os.path.isdir(old)
    assert delete_index_version(root, old) is False


class TestDeleteVersionCLI:
    """Reference typesense_util.py:485-505 — destructive delete confirms
    with default NO (recreate's deferred delete defaults YES; this
    direct delete defaults NO, like the reference)."""

    def _setup_root(self, tmp_path):
        from pyf_aggregator_ray.state import manifest as mf

        root = str(tmp_path)
        old = mf.version_dir(root, 1)
        os.makedirs(old)
        os.makedirs(mf.version_dir(root, 2))
        mf.switch_alias(root, 2)
        return root, old

    def _main(self, argv, answer=None, monkeypatch=None):
        import json as _json
        import io
        from contextlib import redirect_stdout

        from pyf_aggregator_ray import cli

        if answer is not None:
            monkeypatch.setattr("builtins.input", lambda prompt: answer)
        buf = io.StringIO()
        with redirect_stdout(buf):
            rc = cli.main(argv)
        return rc, _json.loads(buf.getvalue().strip().splitlines()[-1])

    def test_default_no_cancels(self, tmp_path, monkeypatch):
        root, old = self._setup_root(tmp_path)
        rc, out = self._main(
            ["delete-version", "--index-root", root, "--version-dir", old],
            answer="", monkeypatch=monkeypatch,
        )
        assert rc == 0 and out == {"deleted": False, "cancelled": True}
        assert os.path.isdir(old)

    def test_n_cancels(self, tmp_path, monkeypatch):
        root, old = self._setup_root(tmp_path)
        _, out = self._main(
            ["delete-version", "--index-root", root, "--version-dir", old],
            answer="n", monkeypatch=monkeypatch,
        )
        assert out["cancelled"] is True and os.path.isdir(old)

    def test_y_deletes(self, tmp_path, monkeypatch):
        root, old = self._setup_root(tmp_path)
        _, out = self._main(
            ["delete-version", "--index-root", root, "--version-dir", old],
            answer="y", monkeypatch=monkeypatch,
        )
        assert out == {"deleted": True, "cancelled": False}
        assert not os.path.isdir(old)

    def test_force_skips_prompt(self, tmp_path, monkeypatch):
        root, old = self._setup_root(tmp_path)

        def no_input(prompt):
            raise AssertionError("prompt must not be shown with --force")

        monkeypatch.setattr("builtins.input", no_input)
        _, out = self._main(
            ["delete-version", "--index-root", root,
             "--version-dir", old, "--force"],
        )
        assert out["deleted"] is True and not os.path.isdir(old)

    def test_live_target_refused(self, tmp_path, monkeypatch):
        from pyf_aggregator_ray.state import manifest as mf

        root, _old = self._setup_root(tmp_path)
        live = mf.read_alias(root)
        import pytest

        with pytest.raises(ValueError):
            self._main(
                ["delete-version", "--index-root", root,
                 "--version-dir", live, "--force"],
            )


def test_confirm_delete_old_defaults_yes_on_eof():
    """Non-interactive recreate (script/cron, no stdin) takes the
    documented default Yes instead of crashing on EOFError — the
    pre-prompt behavior of plain `recreate` is preserved for
    automation."""
    from pyf_aggregator_ray.cli import _confirm_delete_old

    def eof_ask(prompt):
        raise EOFError

    assert _confirm_delete_old(False, False, "v1", ask=eof_ask) is True


def test_delete_version_accepts_bare_version_name(tmp_path):
    from pyf_aggregator_ray.pipelines.maintenance import delete_index_version
    from pyf_aggregator_ray.state import manifest as mf

    root = str(tmp_path)
    old = mf.version_dir(root, 1)
    os.makedirs(old)
    os.makedirs(mf.version_dir(root, 2))
    mf.switch_alias(root, 2)
    bare = os.path.basename(old)
    assert delete_index_version(root, bare) is True
    assert not os.path.isdir(old)
