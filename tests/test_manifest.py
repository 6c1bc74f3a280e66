"""Versioned index dirs + atomic ALIAS cutover (reference K6 analog)."""

import os

from pyf_aggregator_ray.state import manifest as mf


def test_versioning_and_alias(tmp_path):
    root = str(tmp_path / "root")
    assert mf.list_versions(root) == []
    assert mf.next_version(root) == 1
    assert mf.read_alias(root) is None

    os.makedirs(mf.version_dir(root, 1))
    assert mf.next_version(root) == 2
    mf.switch_alias(root, 1)
    assert mf.read_alias(root) == mf.version_dir(root, 1)

    os.makedirs(mf.version_dir(root, 2))
    mf.switch_alias(root, 2)
    assert mf.read_alias(root) == mf.version_dir(root, 2)


def test_gc_keeps_live_and_newest(tmp_path):
    root = str(tmp_path / "root")
    for v in (1, 2, 3, 4):
        os.makedirs(mf.version_dir(root, v))
    mf.switch_alias(root, 4)
    removed = mf.gc_old_versions(root, keep=2)
    assert removed == [1, 2]
    assert mf.list_versions(root) == [3, 4]
    assert mf.read_alias(root) == mf.version_dir(root, 4)


def test_gc_never_removes_aliased(tmp_path):
    root = str(tmp_path / "root")
    for v in (1, 2, 3):
        os.makedirs(mf.version_dir(root, v))
    mf.switch_alias(root, 1)  # alias pinned to the oldest
    mf.gc_old_versions(root, keep=1)
    assert 1 in mf.list_versions(root)


def test_manifest_round_trip(tmp_path):
    vdir = str(tmp_path / "v1")
    os.makedirs(vdir)
    mf.write_manifest(vdir, {"version": 1, "stats": {"num_docs": 10}})
    m = mf.read_manifest(vdir)
    assert m["version"] == 1
    assert m["stats"]["num_docs"] == 10
    assert "written_at" in m


def test_partition_markers(tmp_path):
    vdir = str(tmp_path / "v1")
    os.makedirs(vdir)
    assert not mf.partition_done(vdir, 3)
    mf.mark_partition_done(vdir, 3, {"pid": 3})
    assert mf.partition_done(vdir, 3)
