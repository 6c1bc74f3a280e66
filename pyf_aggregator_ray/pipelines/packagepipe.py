"""Profile-driven package-metadata pipeline (reference ``pyfa pypi -p``).

Resolution mirrors ``cli_utils.py:46-110``: profile (or the
PYFA_DEFAULT_PROFILE env var) -> validated Profile -> auto-named target;
the profile's classifier prefixes drive the M3 predicate over the pypi
side and its npm keywords/scopes drive the M16 validity filter over the
npm side; both run the plugin chain and union under one target name.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ..functions.transforms import has_classifier_prefix
from ..state.profiles import Profile, resolve_profile


def profile_pypi_documents(
    packages: ray.data.Dataset, profile: Profile
) -> ray.data.Dataset:
    """Classifier-predicate filter (M3) + plugin chain over pypi rows."""
    from ..stages.package_chain import PackageChain, validate_required

    prefixes = list(profile.classifiers)

    def keep(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        mask = pa.array(
            [
                has_classifier_prefix(c, prefixes)
                for c in t["classifiers"].to_pylist()
            ]
        )
        return t.filter(mask)

    return (
        packages.map_batches(keep, batch_format="pyarrow")
        .map_batches(PackageChain, batch_format="pyarrow", concurrency=(1, 2))
        .map_batches(validate_required, batch_format="pyarrow")
    )


def profile_npm_documents(
    raw_npm: ray.data.Dataset, profile: Profile
) -> ray.data.Dataset:
    """npm validity (M16, profile-parameterized) + schema transform —
    the shared reader pipeline with the profile's scopes/keywords."""
    from ..sources import npm as npm_src

    return npm_src.npm_documents(
        raw_npm,
        scopes=tuple(profile.npm_scopes),
        filter_keywords=tuple(profile.npm_keywords),
    )


def profile_package_run(
    profile: str | None,
    target: str | None = None,
    profiles_path: str | None = None,
    report_dir: str | None = None,
) -> dict:
    """End-to-end profile-driven run over the deterministic fixtures:
    returns per-registry document counts under the resolved target.
    With ``report_dir``, the run side-writes the incremental
    problems report (reference enricher runs flush one per run,
    ``github.py:284-296``) and the result carries ``n_problems``."""
    from ..sources import npm as npm_src
    from ..sources.packages import synth_packages

    prof, resolved_target = resolve_profile(profile, target, profiles_path)
    if prof is None:
        raise ValueError("a profile is required for the packages pipeline")

    pypi = profile_pypi_documents(
        ray.data.from_arrow(synth_packages(24)), prof
    )
    n_problems = None
    if report_dir is not None:
        from .problems import ProblemReportStage, finalize_problem_report

        try:
            pypi = pypi.map_batches(
                ProblemReportStage,
                fn_constructor_args=(report_dir,),
                batch_format="pyarrow",
                concurrency=1,
            )
            npm_docs = profile_npm_documents(
                ray.data.from_arrow(npm_src.synth_npm_raw()), prof
            )
            n_pypi = pypi.count()
            n_npm = npm_docs.count()
        finally:
            n_problems = len(finalize_problem_report(report_dir))
    else:
        npm_docs = profile_npm_documents(
            ray.data.from_arrow(npm_src.synth_npm_raw()), prof
        )
        n_pypi = pypi.count()
        n_npm = npm_docs.count()
    out = {
        "profile": prof.key,
        "target": resolved_target,
        "n_pypi": int(n_pypi),
        "n_npm": int(n_npm),
        "n_total": int(n_pypi + n_npm),
    }
    if n_problems is not None:
        out["n_problems"] = n_problems
        out["report_dir"] = report_dir
    return out
