"""Reference-derived adversarial combination matrices (round-4 verdict
item 8): the registry-isolation matrix
(/root/reference/tests/test_registry_isolation.py:60-359 — mixed-
registry deletes, scoped unpublish, legacy docs without the scoping
field, refresh==full identity) and the queue/retry matrix
(/root/reference/tests/test_queue.py:142-657 — duplicate skipping,
skipped counts, repeated-delivery idempotency, malformed feed entries)
mapped onto this engine's maintenance / incremental family.
"""

import os

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from pyf_aggregator_ray.config import EngineConfig
from pyf_aggregator_ray.pipelines import maintenance as mx
from pyf_aggregator_ray.pipelines.build_index import build_index
from pyf_aggregator_ray.pipelines.incremental import incremental_update, parse_feed_entry
from pyf_aggregator_ray.pipelines.query import IndexReader
from pyf_aggregator_ray.state import manifest as mf


def _mixed_registry_corpus(n: int = 120) -> pa.Table:
    """A corpus whose ``lang`` column plays the registry role: pypi /
    npm / NULL (the reference's legacy docs that predate the registry
    field, tests/test_registry_isolation.py:96-146)."""
    langs = []
    for i in range(n):
        langs.append(None if i % 10 == 9 else ("pypi" if i % 2 == 0 else "npm"))
    return pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "repo": pa.array([f"org/r{i % 7}" for i in range(n)]),
            "path": pa.array([f"p{i}.py" for i in range(n)]),
            "commit": pa.array([f"c{i:07d}" for i in range(n)]),
            "lang": pa.array(langs, type=pa.string()),
            "content": pa.array(
                [
                    f"shared token alpha beta doc{i} "
                    + ("pypionly " if langs[i] == "pypi" else "")
                    + ("npmonly " if langs[i] == "npm" else "")
                    + ("legacyonly " if langs[i] is None else "")
                    for i in range(n)
                ]
            ),
        }
    )


@pytest.fixture()
def mixed_index(tmp_path, ray_session):
    tbl = _mixed_registry_corpus()
    root = str(tmp_path / "mixed_root")
    cfg = EngineConfig(hot_df_threshold=20, salt_range_docs=40)
    build_index("", root, cfg, corpus=ray.data.from_arrow(tbl), num_parts=4)
    return root, cfg, tbl


# ---------------------------------------------------------------------------
# registry-isolation matrix
# ---------------------------------------------------------------------------


def test_scoped_delete_never_touches_other_registry(mixed_index):
    """Reference :201-263 (npm-only packages survive pypi maintenance;
    unpublish deletes only the scoped registry's docs): delete every
    'pypi' doc; every 'npm' doc still scores, every pypi doc is gone."""
    root, cfg, tbl = mixed_index
    mx.delete_by_predicate(root, "lang", "pypi", cfg)
    reader = IndexReader(root, cfg)
    hits = {d for _, d, _ in reader.score("shared", 200)}
    langs = tbl["lang"].to_pylist()
    pypi_ids = {i for i, l in enumerate(langs) if l == "pypi"}
    npm_ids = {i for i, l in enumerate(langs) if l == "npm"}
    assert not (hits & pypi_ids)
    assert npm_ids <= hits
    # the registry-discriminating terms confirm it at the postings level
    assert not reader.score("pypionly", 10)
    assert reader.score("npmonly", 10)


def test_legacy_null_registry_docs_survive_scoped_delete(mixed_index):
    """Reference :96-146 (docs WITHOUT the registry field are treated as
    belonging to another registry): NULL-lang docs must survive an
    equality-scoped delete on either registry value."""
    root, cfg, tbl = mixed_index
    mx.delete_by_predicate(root, "lang", "pypi", cfg)
    mx.delete_by_predicate(root, "lang", "npm", cfg)
    reader = IndexReader(root, cfg)
    legacy_ids = {
        i for i, l in enumerate(tbl["lang"].to_pylist()) if l is None
    }
    hits = {d for _, d, _ in reader.score("shared", 200)}
    assert hits == legacy_ids
    assert reader.score("legacyonly", 10)


def test_scoped_delete_is_idempotent(mixed_index):
    """Reference unpublish semantics re-delivered (queue retries replay
    deletes): a second identical scoped delete is a no-op — same stats,
    same survivors."""
    root, cfg, _ = mixed_index
    mx.delete_by_predicate(root, "lang", "npm", cfg)
    s1 = mf.read_stats(mf.read_alias(root))
    r1 = IndexReader(root, cfg).score("shared", 200)
    mx.delete_by_predicate(root, "lang", "npm", cfg)
    s2 = mf.read_stats(mf.read_alias(root))
    r2 = IndexReader(root, cfg).score("shared", 200)
    assert s1 == s2
    assert r1 == r2


def test_delete_then_increment_readds_docs(mixed_index):
    """Unpublish-then-republish (reference upsert-by-id convergence,
    indexer.py:41-43): docs deleted by a scoped maintenance pass can be
    re-ingested by a later increment and score again."""
    root, cfg, tbl = mixed_index
    mx.delete_by_predicate(root, "lang", "npm", cfg)
    assert not IndexReader(root, cfg).score("npmonly", 10)
    npm_rows = tbl.filter(
        pa.compute.equal(tbl["lang"], pa.scalar("npm"))
    )
    m = incremental_update(root, ray.data.from_arrow(npm_rows), cfg, num_parts=4)
    assert m["metrics"]["overlap_docs"] == 0  # ids were tombstoned away
    reader = IndexReader(root, cfg)
    assert reader.score("npmonly", 10)
    hits = {d for _, d, _ in reader.score("shared", 200)}
    assert set(npm_rows["doc_id"].to_pylist()) <= hits


def test_refresh_equals_full_after_mixed_maintenance(mixed_index, tmp_path):
    """Reference :359-388 (refresh builds the same ids as a full fetch)
    stressed through a mixed sequence: delete one registry, re-add it,
    then reconcile against the full snapshot — the surviving id set must
    equal the full corpus', and scoring must match a from-scratch build."""
    root, cfg, tbl = mixed_index
    mx.delete_by_predicate(root, "lang", "pypi", cfg)
    pypi_rows = tbl.filter(pa.compute.equal(tbl["lang"], pa.scalar("pypi")))
    incremental_update(root, ray.data.from_arrow(pypi_rows), cfg, num_parts=4)
    mx.reconcile_stale(root, set(tbl["doc_id"].to_pylist()), cfg)

    fresh_root = str(tmp_path / "fresh_root")
    build_index("", fresh_root, cfg, corpus=ray.data.from_arrow(tbl), num_parts=4)
    ra, rb = IndexReader(root, cfg), IndexReader(fresh_root, cfg)
    for query in ("shared token", "pypionly", "npmonly", "legacyonly", "alpha beta"):
        assert ra.score(query, 50) == rb.score(query, 50), query


# ---------------------------------------------------------------------------
# queue/retry matrix
# ---------------------------------------------------------------------------


def test_partial_overlap_delta_dedups_exactly(mixed_index):
    """Reference dedup semantics (queue.py:514-553: duplicates skipped,
    skipped count reported): a delta overlapping half its rows with the
    index ingests only the fresh half, reports the overlap, and a replay
    of the SAME delta is fully skipped."""
    root, cfg, tbl = mixed_index
    n = tbl.num_rows
    extra = _mixed_registry_corpus(40)
    extra = extra.set_column(
        0, "doc_id", pa.array(np.arange(n, n + 40, dtype=np.int64))
    )
    delta = pa.concat_tables([tbl.slice(0, 40), extra])  # half old, half new
    m1 = incremental_update(root, ray.data.from_arrow(delta), cfg, num_parts=4)
    assert m1["metrics"]["overlap_docs"] == 40
    assert m1["stats"]["num_docs"] == n + 40
    # retry/replay delivers the same payload again (task_acks_late
    # semantics): everything is overlap, nothing double-indexes
    m2 = incremental_update(root, ray.data.from_arrow(delta), cfg, num_parts=4)
    assert m2["metrics"]["overlap_docs"] == 80
    assert m2["stats"]["num_docs"] == n + 40
    assert m2["stats"]["total_postings"] == m1["stats"]["total_postings"]
    assert m2["window_overflow_warning"] is False


def test_empty_delta_is_noop_with_overflow_silence(mixed_index):
    """Reference queue.py:442-455 (empty feed returns zero, no dedup
    noise): an empty delta changes nothing and must not raise the
    window-overflow warning."""
    root, cfg, tbl = mixed_index
    before = mf.read_stats(mf.read_alias(root))
    m = incremental_update(
        root,
        ray.data.from_arrow(tbl.slice(0, 0)),
        cfg,
        num_parts=4,
    )
    assert m["stats"]["num_docs"] == before["num_docs"]
    assert m["metrics"]["overlap_docs"] == 0
    assert m["window_overflow_warning"] is False


MALFORMED_FEED_CASES = [
    # (entry, expected) — reference queue.py:456-487 skips entries
    # without a package id; :146-152 skips empty payloads
    ({}, None),
    ({"title": "", "link": ""}, None),
    ({"link": "https://example.org/not-a-project/xyz"}, None),
    # release link + numeric epoch passes through unchanged
    (
        {"link": "https://pypi.org/project/foo/1.2.3/", "published_parsed": 1700000000},
        {"package_id": "foo", "release_id": "1.2.3", "timestamp": 1700000000},
    ),
    # new-package title fallback, no release id
    (
        {"title": "bar added to PyPI"},
        {"package_id": "bar", "release_id": None},
    ),
    # title fallback "pkg version" split
    (
        {"title": "baz 2.0"},
        {"package_id": "baz", "release_id": "2.0"},
    ),
]


@pytest.mark.parametrize("entry,expected", MALFORMED_FEED_CASES)
def test_feed_entry_adversarial_shapes(entry, expected):
    got = parse_feed_entry(entry)
    if expected is None:
        assert got is None
    else:
        for k, v in expected.items():
            assert got[k] == v, (k, got)


def test_feed_filter_name_combination():
    """filter_name applies AFTER id extraction on every shape
    (reference fetcher.py:374-376 + :455-456 combined)."""
    release = {"link": "https://pypi.org/project/plone.api/2.0/"}
    assert parse_feed_entry(release, filter_name="plone") is not None
    assert parse_feed_entry(release, filter_name="django") is None
    added = {"title": "plone.volto added to PyPI"}
    assert parse_feed_entry(added, filter_name="volto") is not None
    assert parse_feed_entry(added, filter_name="flask") is None


def test_scoped_values_with_special_characters(tmp_path, ray_session):
    """Reference db.py:16-22 backtick-quotes filter values so names like
    '@plone/volto' filter literally (tests/test_registry_isolation.py:
    60-77). This engine's filters are structural (Arrow equality on the
    column — no query-string parsing to inject into), which this pins:
    scoped npm names, embedded spaces, quotes and '&&' in values all
    filter and delete literally."""
    from pyf_aggregator_ray.pipelines.searchplus import FilteredScorerStage

    weird = ["@plone/volto", "a b c", "x'y\"z", "l && r", "plain"]
    n = 100
    tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "repo": pa.array([weird[i % len(weird)] for i in range(n)]),
            "path": pa.array([f"p{i}" for i in range(n)]),
            "commit": pa.array([f"c{i:07d}" for i in range(n)]),
            "lang": pa.array(["py"] * n),
            "content": pa.array([f"token alpha doc{i}" for i in range(n)]),
        }
    )
    root = str(tmp_path / "weird_root")
    cfg = EngineConfig(hot_df_threshold=20, salt_range_docs=40)
    build_index("", root, cfg, corpus=ray.data.from_arrow(tbl), num_parts=4)

    stage = FilteredScorerStage(root, cfg)
    for v in ("@plone/volto", "a b c", "x'y\"z"):
        allowed = set(stage._allowed_ids(f"repo:={v}").tolist())
        want = {i for i in range(n) if weird[i % len(weird)] == v}
        assert allowed == want, v
    # '&&' inside a value cannot be expressed through the conjunction
    # string syntax (it IS the separator) — the structural API takes it
    ids = mx.delete_by_predicate(root, "repo", "l && r", cfg)
    reader = IndexReader(root, cfg)
    hits = {d for _, d, _ in reader.score("token", 200)}
    gone = {i for i in range(n) if weird[i % len(weird)] == "l && r"}
    assert not (hits & gone)
    assert hits == set(range(n)) - gone
