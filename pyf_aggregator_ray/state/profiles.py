"""Profiles: YAML-declared ecosystems -> pipeline parameterization.

Behavioral port of the reference's ProfileManager + CLI resolution
(``/root/reference/src/pyf/aggregator/profiles.py:7-157``,
``cli_utils.py:46-110``): a profile names a framework ecosystem and
declares the classifier prefixes that select its packages, optionally an
npm section (keywords + scopes); the target index name auto-derives from
the profile when not given explicitly.

In this engine a resolved profile parameterizes:
* the classifier predicate (M3, ``functions.transforms.
  has_classifier_prefix``) applied to the package-metadata path
* the npm validity predicate (M16, ``sources.npm.npm_is_valid``)
* the index root name (versioned directory under the engine index root)
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import yaml

DEFAULT_PROFILES_PATH = os.path.join(os.path.dirname(__file__), "profiles.yaml")


class ProfileError(ValueError):
    """Invalid profile configuration or unknown profile name."""


@dataclass
class Profile:
    key: str
    name: str
    classifiers: list[str]
    npm_keywords: list[str] = field(default_factory=list)
    npm_scopes: list[str] = field(default_factory=list)

    @property
    def target(self) -> str:
        """Auto-derived index/collection name (reference cli_utils.py:97-99)."""
        return self.key

    def has_npm(self) -> bool:
        return bool(self.npm_keywords or self.npm_scopes)


class ProfileManager:
    """Loads and validates profiles.yaml; raises ProfileError on invalid
    structure (the reference logs + exits; a library raises)."""

    def __init__(self, config_path: str | None = None):
        self.config_path = config_path or DEFAULT_PROFILES_PATH
        if not os.path.exists(self.config_path):
            raise FileNotFoundError(
                f"Profile configuration not found: {self.config_path}"
            )
        with open(self.config_path) as f:
            try:
                config = yaml.safe_load(f)
            except yaml.YAMLError as e:
                raise ProfileError(f"Invalid YAML in {self.config_path}: {e}")
        if not config or "profiles" not in config:
            raise ProfileError(
                f"Invalid profile configuration: missing 'profiles' key in "
                f"{self.config_path}"
            )
        self._raw = config["profiles"]

    def list_profiles(self) -> list[str]:
        return sorted(self._raw)

    def get(self, key: str) -> Profile:
        """Validated profile; raises ProfileError on unknown/invalid
        (required: name, non-empty classifier list — profiles.py:82-112)."""
        if key not in self._raw:
            raise ProfileError(
                f"Profile '{key}' not found. Available: "
                f"{', '.join(self.list_profiles())}"
            )
        raw = self._raw[key] or {}
        if "name" not in raw:
            raise ProfileError(f"Profile '{key}' missing 'name' field")
        classifiers = raw.get("classifiers")
        if not isinstance(classifiers, list) or not classifiers:
            raise ProfileError(
                f"Profile '{key}' must declare a non-empty classifiers list"
            )
        npm = raw.get("npm") or {}
        return Profile(
            key=key,
            name=raw["name"],
            classifiers=list(classifiers),
            npm_keywords=list(npm.get("keywords") or []),
            npm_scopes=list(npm.get("scopes") or []),
        )

    def get_npm_config(self, key: str) -> dict | None:
        p = self.get(key)
        if not p.has_npm():
            return None
        return {"keywords": p.npm_keywords, "scopes": p.npm_scopes}

    def validate_npm_profile(self, key: str) -> bool:
        return self.get(key).has_npm()


def resolve_profile(
    profile: str | None,
    target: str | None,
    config_path: str | None = None,
    require_npm: bool = False,
) -> tuple[Profile | None, str]:
    """CLI resolution (cli_utils.py:46-110): explicit profile (or
    PYFA_DEFAULT_PROFILE env), validated; target defaults to the profile
    key. Returns (profile_or_none, target)."""
    effective = profile or os.environ.get("PYFA_DEFAULT_PROFILE") or None
    prof: Profile | None = None
    if effective:
        prof = ProfileManager(config_path).get(effective)
        if require_npm and not prof.has_npm():
            raise ProfileError(
                f"Profile '{effective}' has no npm configuration; add an "
                f"'npm:' section with keywords/scopes"
            )
        if not target:
            target = prof.target
    if not target:
        raise ProfileError(
            "Target index name is required: pass --target, --profile, or "
            "set PYFA_DEFAULT_PROFILE"
        )
    return prof, target
