"""Golden version_sortable vectors, ported verbatim from the reference
(``/root/reference/tests/test_version_sortable_integration.py:27-47``)."""

import pyarrow as pa
import pytest

from pyf_aggregator_ray.functions.versions import (
    version_parts,
    version_slice_batch,
    version_sortable,
)

GOLDEN = [
    ("1.0.3", "1.0001.0000.0003.0000.0000"),
    ("2.1.2", "1.0002.0001.0002.0000.0000"),
    ("2.1.3", "1.0002.0001.0003.0000.0000"),
    ("2.1.5", "1.0002.0001.0005.0000.0000"),
    ("12.5.9", "1.0012.0005.0009.0000.0000"),
    ("2.0.0a1", "0.0002.0000.0000.0001.0001"),
    ("2.0.0b1", "0.0002.0000.0000.0002.0001"),
    ("2.0.0", "1.0002.0000.0000.0000.0000"),
]


@pytest.mark.parametrize("version,expected", GOLDEN)
def test_golden_vectors(version, expected):
    assert version_sortable(version) == expected


def test_sort_order_matches_reference():
    order = ["1.0.3", "2.1.2", "2.1.3", "2.1.5", "12.5.9"]
    encoded = [version_sortable(v) for v in order]
    assert encoded == sorted(encoded)
    pre = ["2.0.0a1", "2.0.0b1", "2.0.0"]  # alpha < beta < stable
    enc = [version_sortable(v) for v in pre]
    assert enc == sorted(enc)


def test_prerelease_type_ordering():
    # dev < alpha < beta < rc, all below stable
    vs = ["1.0.0dev1", "1.0.0a1", "1.0.0b1", "1.0.0rc1", "1.0.0"]
    enc = [version_sortable(v) for v in vs]
    assert enc == sorted(enc)


def test_unparseable_and_empty():
    assert version_sortable(None) == "0.0000.0000.0000.0000.0000"
    assert version_sortable("") == "0.0000.0000.0000.0000.0000"
    assert version_sortable("not-a-version!") == "0.0000.0000.0000.0000.0000"


def test_parts():
    assert version_parts("2.1.5") == (2, 1, 5, "")
    assert version_parts("2.0.0b1") == (2, 0, 0, "b1")


def test_batch_transform():
    batch = pa.table({"version": [v for v, _ in GOLDEN]})
    out = version_slice_batch(batch)
    assert out["version_sortable"].to_pylist() == [e for _, e in GOLDEN]
    assert out["version_major"].to_pylist()[:5] == [1, 2, 2, 2, 12]


@pytest.mark.parametrize("version", [v for v, _ in GOLDEN] + [
    "2.0.0rc1", "2.0.0.dev3", "3.0.0c2", "0.1", "7", "1.2.3.4",
])
def test_six_segment_format_invariant(version):
    """Reference test_version_sortable_integration.py:137-162: every
    encoding is STABLE(1 digit, 0|1) + five 4-digit segments."""
    sortable = version_sortable(version)
    segments = sortable.split(".")
    assert len(segments) == 6
    assert segments[0] in ("0", "1")
    for seg in segments[1:]:
        assert len(seg) == 4 and seg.isdigit()


def test_pretype_ordering_dev_alpha_beta_rc_stable():
    """version_slicer.py pretype lattice: dev < alpha < beta < rc <
    stable, and prenum orders within a type."""
    chain = ["2.0.0.dev1", "2.0.0a1", "2.0.0a2", "2.0.0b1", "2.0.0rc1",
             "2.0.0rc2", "2.0.0"]
    encoded = [version_sortable(v) for v in chain]
    assert encoded == sorted(encoded)
    # stable sorts above a HIGHER pre-release of the next version
    # (test_version_sortable_integration.py:356: 2.0.0 > 2.1.0rc9 is
    # false — the major/minor dominates — but 2.0.0 > 2.0.0rc9 holds)
    assert version_sortable("2.0.0") > version_sortable("2.0.0rc9")
