"""Profiles surface (§2.11): YAML loading/validation + profile-driven
pipeline parameterization (reference profiles.py:7-157, cli_utils.py:
46-110)."""

import os

import pytest

from pyf_aggregator_ray.state.profiles import (
    ProfileError,
    ProfileManager,
    resolve_profile,
)


def test_list_and_get_builtin_profiles():
    pm = ProfileManager()
    assert pm.list_profiles() == ["django", "flask", "plone"]
    p = pm.get("plone")
    assert p.name == "Plone"
    assert p.target == "plone"  # auto-derived index name
    assert "Framework :: Plone" in p.classifiers
    assert p.npm_scopes == ["@plone"]
    assert pm.validate_npm_profile("plone")
    assert not pm.get("django").has_npm()


def test_unknown_and_invalid_profiles(tmp_path):
    pm = ProfileManager()
    with pytest.raises(ProfileError, match="not found"):
        pm.get("nope")
    bad = tmp_path / "bad.yaml"
    bad.write_text("profiles:\n  x:\n    name: X\n    classifiers: []\n")
    with pytest.raises(ProfileError, match="non-empty classifiers"):
        ProfileManager(str(bad)).get("x")
    noname = tmp_path / "noname.yaml"
    noname.write_text("profiles:\n  y:\n    classifiers: ['A']\n")
    with pytest.raises(ProfileError, match="missing 'name'"):
        ProfileManager(str(noname)).get("y")
    empty = tmp_path / "empty.yaml"
    empty.write_text("{}")
    with pytest.raises(ProfileError, match="missing 'profiles'"):
        ProfileManager(str(empty))
    with pytest.raises(FileNotFoundError):
        ProfileManager(str(tmp_path / "missing.yaml"))


def test_resolve_profile_target_and_env(monkeypatch):
    prof, target = resolve_profile("plone", None)
    assert prof.key == "plone" and target == "plone"
    prof, target = resolve_profile("plone", "custom")
    assert target == "custom"
    monkeypatch.setenv("PYFA_DEFAULT_PROFILE", "django")
    prof, target = resolve_profile(None, None)
    assert prof.key == "django" and target == "django"
    monkeypatch.delenv("PYFA_DEFAULT_PROFILE")
    with pytest.raises(ProfileError, match="Target index name"):
        resolve_profile(None, None)
    with pytest.raises(ProfileError, match="no npm configuration"):
        resolve_profile("django", None, require_npm=True)


def test_profile_driven_package_run(ray_session):
    """The profile parameterizes BOTH predicates: plone's classifier
    prefixes select the Framework :: Plone rows, and its npm scopes/
    keywords select the valid npm rows — a profile without npm config
    yields zero npm documents."""
    from pyf_aggregator_ray.pipelines.packagepipe import profile_package_run

    out = profile_package_run("plone")
    assert out["target"] == "plone"
    # fixture: 16 of 24 rows carry Framework :: Plone :: 6.0
    assert out["n_pypi"] == 16
    assert out["n_npm"] == 6  # same valid set as the npm_transform query
    assert out["n_total"] == 22

    django = profile_package_run("django")
    assert django["n_pypi"] == 0  # no Django classifiers in the fixture
    assert django["n_npm"] == 0  # no npm config on the profile


def test_error_paths_reference_vectors(tmp_path):
    """Config error paths (reference tests/test_profiles.py:25-304):
    missing file, invalid YAML, missing profiles key, empty config,
    per-profile validation failures, and sorted listing."""
    import pytest

    from pyf_aggregator_ray.state.profiles import ProfileError, ProfileManager

    with pytest.raises(FileNotFoundError):
        ProfileManager(str(tmp_path / "missing.yaml"))

    bad_yaml = tmp_path / "bad.yaml"
    bad_yaml.write_text("profiles: [unclosed\n  - ][")
    with pytest.raises(ProfileError):
        ProfileManager(str(bad_yaml))

    no_key = tmp_path / "nokey.yaml"
    no_key.write_text("something_else:\n  a: 1\n")
    with pytest.raises(ProfileError):
        ProfileManager(str(no_key))

    empty = tmp_path / "empty.yaml"
    empty.write_text("")
    with pytest.raises(ProfileError):
        ProfileManager(str(empty))

    cfg = tmp_path / "p.yaml"
    cfg.write_text(
        "profiles:\n"
        "  zeta:\n    name: Zeta\n    classifiers: ['Framework :: Z']\n"
        "  alpha:\n    name: Alpha\n    classifiers: ['Framework :: A']\n"
        "  noname:\n    classifiers: ['Framework :: X']\n"
        "  nocls:\n    name: NoCls\n"
        "  strcls:\n    name: StrCls\n    classifiers: 'Framework :: S'\n"
        "  emptycls:\n    name: E\n    classifiers: []\n"
    )
    pm = ProfileManager(str(cfg))
    # sorted listing
    assert pm.list_profiles() == sorted(pm.list_profiles())
    assert pm.get("alpha").name == "Alpha"
    for bad in ("noname", "nocls", "strcls", "emptycls", "nonexistent"):
        with pytest.raises(ProfileError):
            pm.get(bad)


class TestMultiProfileCoexistence:
    """Reference test_integration_profiles.py:299-356 — independent
    simultaneous profiles with disjoint classifier sets and unique
    auto-derived targets."""

    def test_different_profiles_have_different_classifiers(self):
        pm = ProfileManager()
        plone = set(pm.get("plone").classifiers)
        django = set(pm.get("django").classifiers)
        flask = set(pm.get("flask").classifiers)
        assert plone.isdisjoint(django)
        assert plone.isdisjoint(flask)
        assert django.isdisjoint(flask)

    def test_profiles_can_be_loaded_simultaneously(self):
        pm = ProfileManager()
        loaded = {k: pm.get(k) for k in pm.list_profiles()}
        assert len(loaded) == 3
        # each object keeps its own identity — no shared mutation
        assert loaded["plone"].classifiers != loaded["django"].classifiers

    def test_profile_based_targets_are_unique(self):
        pm = ProfileManager()
        targets = [pm.get(k).target for k in pm.list_profiles()]
        assert len(targets) == len(set(targets))

    def test_all_builtin_profiles_validate(self):
        # test_integration_profiles.py:80-94: every profile loads with
        # non-empty framework classifiers
        pm = ProfileManager()
        for key in pm.list_profiles():
            prof = pm.get(key)
            assert prof.classifiers, key
            assert all(
                c.startswith("Framework ::") for c in prof.classifiers
            ), key

    def test_classifier_filtering_respects_active_profile(self):
        # test_integration_profiles.py:228-296: a package matches under
        # its own framework's profile and not under another's
        import pyf_aggregator_ray.functions.transforms as tf

        pm = ProfileManager()
        django_pkg = ["Framework :: Django", "Framework :: Django :: 4.2"]
        flask_pkg = ["Framework :: Flask"]
        assert tf.has_classifier_prefix(django_pkg, pm.get("django").classifiers)
        assert not tf.has_classifier_prefix(django_pkg, pm.get("flask").classifiers)
        assert tf.has_classifier_prefix(flask_pkg, pm.get("flask").classifiers)
        assert not tf.has_classifier_prefix(flask_pkg, pm.get("plone").classifiers)


def test_explicit_profile_overrides_env(monkeypatch):
    # reference test_cli_default_profile.py:54-83: -p beats the env var
    monkeypatch.setenv("PYFA_DEFAULT_PROFILE", "django")
    prof, target = resolve_profile("flask", None)
    assert prof.key == "flask" and target == "flask"


def test_error_message_mentions_default_profile_env(monkeypatch):
    # reference :84-114: the no-target error teaches the env var
    monkeypatch.delenv("PYFA_DEFAULT_PROFILE", raising=False)
    with pytest.raises(ProfileError, match="PYFA_DEFAULT_PROFILE"):
        resolve_profile(None, None)


def test_invalid_default_profile_env_raises(monkeypatch):
    monkeypatch.setenv("PYFA_DEFAULT_PROFILE", "no-such-profile")
    with pytest.raises(ProfileError, match="not found"):
        resolve_profile(None, None)
