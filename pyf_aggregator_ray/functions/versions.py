"""Version parsing -> sortable encoding (reference semantics, M6).

Reimplements the behavior of the reference's version_slicer plugin
(``/root/reference/src/pyf/aggregator/plugins/version_slicer.py:5-106``):
regex-parse ``version`` into major/minor/bugfix/postfix and encode a
6-segment zero-padded ``version_sortable`` string

    STABLE.MAJOR.MINOR.BUGFIX.PRETYPE.PRENUM

where STABLE=1 for stable releases (sorts above every pre-release) and
PRETYPE orders dev(0000) < alpha(0001) < beta(0002) < rc(0003).

Golden vectors from the reference test suite
(``tests/test_version_sortable_integration.py:27-47``) are asserted
verbatim in tests/test_versions.py. Exposed both as scalar functions and
as a vectorized batch transform for ``map_batches``.
"""

from __future__ import annotations

import re

import pyarrow as pa

_VERSION_RE = re.compile(
    r"^(?P<major>\d*)\.(?P<minor>\d*)\.?(?P<postfix1>[a-zA-Z]+\d*)?"
    r"(?P<bugfix>\d)?(?P<postfix2>[a-zA-Z]+\d*)?$",
    re.MULTILINE | re.IGNORECASE,
)

_ZERO_SORTABLE = "0.0000.0000.0000.0000.0000"


def _digits(s: str) -> str:
    return "".join(c for c in s if c.isdigit()) or "0"


def version_sortable(version: str | None) -> str:
    """Scalar: version string -> sortable encoding (or the zero sentinel)."""
    if not version:
        return _ZERO_SORTABLE
    m = _VERSION_RE.search(version)
    if not m:
        return _ZERO_SORTABLE
    g = m.groupdict()
    postfix = (g.get("postfix1") or g.get("postfix2") or "").lower()
    major = g.get("major") or "0"
    minor = g.get("minor") or "0"
    bugfix = g.get("bugfix") or "0"
    if postfix.startswith("dev"):
        stable, pre_type = "0", "0000"
    elif postfix.startswith(("rc", "c")):
        stable, pre_type = "0", "0003"
    elif postfix.startswith(("b",)):
        stable, pre_type = "0", "0002"
    elif postfix.startswith(("a",)):
        stable, pre_type = "0", "0001"
    elif postfix:
        # unknown postfix: treat as stable, like the reference's regex
        # falling through with no recognized pre-type
        stable, pre_type = "1", "0000"
    else:
        stable, pre_type = "1", "0000"
    pre_num = _digits(postfix) if stable == "0" else "0"
    return (
        f"{stable}.{major.zfill(4)}.{minor.zfill(4)}.{bugfix.zfill(4)}."
        f"{pre_type}.{pre_num.zfill(4)}"
    )


def version_parts(version: str | None) -> tuple[int, int, int, str]:
    """Scalar: (major, minor, bugfix, postfix) — reference fields
    version_major/minor/bugfix/version_postfix."""
    if not version:
        return 0, 0, 0, ""
    m = _VERSION_RE.search(version)
    if not m:
        return 0, 0, 0, ""
    g = m.groupdict()
    return (
        int(g["major"]) if g.get("major") else 0,
        int(g["minor"]) if g.get("minor") else 0,
        int(g["bugfix"]) if g.get("bugfix") else 0,
        g.get("postfix2") or "",
    )


def version_slice_batch(batch: pa.Table, column: str = "version") -> pa.Table:
    """map_batches transform: append version_major/minor/bugfix/postfix and
    version_sortable columns derived from ``column``."""
    versions = batch[column].to_pylist()
    majors, minors, bugfixes, postfixes, sortables = [], [], [], [], []
    for v in versions:
        a, b, c, p = version_parts(v)
        majors.append(a)
        minors.append(b)
        bugfixes.append(c)
        postfixes.append(p)
        sortables.append(version_sortable(v))
    return (
        batch.append_column("version_major", pa.array(majors, type=pa.int64()))
        .append_column("version_minor", pa.array(minors, type=pa.int64()))
        .append_column("version_bugfix", pa.array(bugfixes, type=pa.int64()))
        .append_column("version_postfix", pa.array(postfixes, type=pa.string()))
        .append_column("version_sortable", pa.array(sortables, type=pa.string()))
    )
