"""Index versioning, manifests, checkpoints, atomic alias cutover.

Mirrors the reference's zero-downtime collection versioning
(``/root/reference/src/pyf/aggregator/typesense_util.py:174-319``: create
``name-N``, import, verify counts, switch alias, GC old) and its sincefile
watermark (``fetcher.py:106-118``):

* an index lives at ``{root}/v{N}/`` (docs/, postings/, stats.json,
  manifest.json)
* ``{root}/ALIAS`` is a one-line pointer file, written atomically
  (tmp + rename) only AFTER count verification — the atomic cutover
* ``manifest.json`` records lineage (input files, row counts, config,
  per-stage metrics, completed partitions) — the resume unit is one doc
  partition (see pipelines/build_index.py: resumable mode)
"""

from __future__ import annotations

import json
import os
import re
import shutil
import tempfile
import time


def list_versions(root: str) -> list[int]:
    if not os.path.isdir(root):
        return []
    out = []
    for name in os.listdir(root):
        m = re.fullmatch(r"v(\d+)", name)
        if m and os.path.isdir(os.path.join(root, name)):
            out.append(int(m.group(1)))
    return sorted(out)


def next_version(root: str) -> int:
    vs = list_versions(root)
    return (vs[-1] + 1) if vs else 1


def version_dir(root: str, version: int) -> str:
    return os.path.join(root, f"v{version}")


def read_alias(root: str) -> str | None:
    """Current live version dir, or None if no alias yet."""
    alias = os.path.join(root, "ALIAS")
    if not os.path.exists(alias):
        return None
    with open(alias) as f:
        v = f.read().strip()
    return os.path.join(root, v)


def switch_alias(root: str, version: int) -> str:
    """Atomically point ALIAS at v{version} (write tmp, rename)."""
    os.makedirs(root, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=root, prefix=".alias.")
    try:
        with os.fdopen(fd, "w") as f:
            f.write(f"v{version}\n")
        os.replace(tmp, os.path.join(root, "ALIAS"))
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)
    return version_dir(root, version)


def gc_old_versions(root: str, keep: int = 2) -> list[int]:
    """Delete all but the newest ``keep`` versions (never the aliased one).
    Reference analog: delete-old-collection after verified cutover."""
    vs = list_versions(root)
    live = read_alias(root)
    removed = []
    for v in vs[:-keep] if keep else vs:
        d = version_dir(root, v)
        if live and os.path.abspath(d) == os.path.abspath(live):
            continue
        shutil.rmtree(d, ignore_errors=True)
        removed.append(v)
    return removed


def find_unfinished_version(root: str) -> int | None:
    """Latest version dir holding partition checkpoints (``partials/``)
    but no manifest.json — an interrupted resumable build. A rerun with
    ``resumable=True`` reuses this vdir so its _SUCCESS markers are
    honored instead of starting a fresh v{N+1} from scratch."""
    for v in reversed(list_versions(root)):
        d = version_dir(root, v)
        if read_manifest(d) is None and os.path.isdir(os.path.join(d, "partials")):
            return v
    return None


def write_manifest(vdir: str, manifest: dict) -> None:
    manifest = dict(manifest)
    manifest.setdefault("written_at", time.time())
    fd, tmp = tempfile.mkstemp(dir=vdir, prefix=".manifest.")
    with os.fdopen(fd, "w") as f:
        json.dump(manifest, f, indent=2, default=str)
    os.replace(tmp, os.path.join(vdir, "manifest.json"))


def read_manifest(vdir: str) -> dict | None:
    p = os.path.join(vdir, "manifest.json")
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def write_stats(vdir: str, stats: dict) -> None:
    fd, tmp = tempfile.mkstemp(dir=vdir, prefix=".stats.")
    with os.fdopen(fd, "w") as f:
        json.dump(stats, f, indent=2)
    os.replace(tmp, os.path.join(vdir, "stats.json"))


def read_stats(vdir: str) -> dict:
    with open(os.path.join(vdir, "stats.json")) as f:
        return json.load(f)


def write_partials_meta(vdir: str, meta: dict) -> None:
    d = os.path.join(vdir, "partials")
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, "_META.json"), "w") as f:
        json.dump(meta, f)


def read_partials_meta(vdir: str) -> dict | None:
    p = os.path.join(vdir, "partials", "_META.json")
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def partition_done(vdir: str, pid: int) -> bool:
    return os.path.exists(os.path.join(vdir, "partials", f"part_{pid:05d}", "_SUCCESS"))


def mark_partition_done(vdir: str, pid: int, info: dict) -> None:
    d = os.path.join(vdir, "partials", f"part_{pid:05d}")
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, "_SUCCESS"), "w") as f:
        json.dump(info, f)
