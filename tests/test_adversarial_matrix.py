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


def test_unique_package_names_exclusion_matrix(mixed_index):
    """Reference db.py:250-304 (tests/test_registry_isolation.py:76-145):
    registry= lists only names with docs in that registry;
    exclude_registry= drops names whose docs ALL belong to it, keeps
    names present in both registries, and treats legacy NULL-registry
    docs as belonging to every other registry."""
    root, cfg, tbl = mixed_index

    all_names = mx.unique_package_names(root)
    assert all_names == {f"org/r{i}" for i in range(7)}

    # the synthetic corpus interleaves registries across repos, so every
    # repo has pypi docs; verify against the table itself
    import collections

    by_repo = collections.defaultdict(set)
    for repo, lang in zip(tbl["repo"].to_pylist(), tbl["lang"].to_pylist()):
        by_repo[repo].add(lang)

    pypi_names = mx.unique_package_names(root, registry="pypi")
    assert pypi_names == {r for r, langs in by_repo.items() if "pypi" in langs}

    # exclude npm: keep names that have ANY non-npm doc (pypi or legacy)
    keep = mx.unique_package_names(root, exclude_registry="npm")
    expected = {
        r for r, langs in by_repo.items() if any(l != "npm" for l in langs)
    }
    assert keep == expected


def test_unique_package_names_drops_single_registry_names(
    tmp_path, ray_session
):
    """An npm-ONLY name disappears under exclude_registry=npm; a name in
    both registries survives; a legacy NULL doc keeps its name."""
    n = 30
    langs = (["npm"] * 10) + (["npm"] * 5 + ["pypi"] * 5) + ([None] * 10)
    repos = (
        [f"npm-only/r{i % 2}" for i in range(10)]
        + [f"both/r{i % 2}" for i in range(10)]
        + [f"legacy/r{i % 2}" for i in range(10)]
    )
    tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "repo": pa.array(repos),
            "path": pa.array([f"p{i}.py" for i in range(n)]),
            "commit": pa.array([f"c{i:07d}" for i in range(n)]),
            "lang": pa.array(langs, type=pa.string()),
            "content": pa.array([f"alpha beta doc{i}" for i in range(n)]),
        }
    )
    root = str(tmp_path / "root")
    build_index("", root, EngineConfig(), corpus=ray.data.from_arrow(tbl),
                num_parts=2)
    keep = mx.unique_package_names(root, exclude_registry="npm")
    assert keep == {"both/r0", "both/r1", "legacy/r0", "legacy/r1"}
    npm_names = mx.unique_package_names(root, registry="npm")
    assert npm_names == {"npm-only/r0", "npm-only/r1", "both/r0", "both/r1"}


def test_delete_package_excluding_registry(mixed_index):
    """Reference db.py:306-360: deleting one package with
    exclude_registry keeps ONLY that registry's documents — legacy
    NULL-registry docs of the package are deleted too, other packages
    untouched."""
    root, cfg, tbl = mixed_index
    target = "org/r3"

    before = {
        (d, l)
        for d, r, l in zip(
            tbl["doc_id"].to_pylist(),
            tbl["repo"].to_pylist(),
            tbl["lang"].to_pylist(),
        )
        if r == target
    }
    assert any(l == "npm" for _, l in before)
    assert any(l != "npm" for _, l in before)

    mx.delete_package_excluding_registry(root, target, keep_registry="npm")

    live = mf.read_alias(root)
    docs = ray.data.read_parquet(os.path.join(live, "docs")).to_pandas()
    mine = docs[docs["repo"] == target]
    # only npm docs of the target survive (NULL-registry deleted)
    assert set(mine["lang"]) == {"npm"}
    assert len(mine) == sum(1 for _, l in before if l == "npm")
    # every other package keeps all its docs
    others = docs[docs["repo"] != target]
    expected_others = sum(1 for r in tbl["repo"].to_pylist() if r != target)
    assert len(others) == expected_others


def test_weekly_refresh_leaves_npm_alone(mixed_index):
    """Reference test_registry_isolation.py:263-293: the weekly refresh
    lists only names with non-npm documents, deletes gone/declassified
    packages WITHOUT touching npm documents, and counts outcomes."""
    from pyf_aggregator_ray.pipelines import tasks as tk

    root, cfg, tbl = mixed_index

    # the registry "serves" every repo except org/r3 (gone) and org/r4
    # (lost the classifier)
    rows = []
    for r in sorted({x for x in tbl["repo"].to_pylist()}):
        if r == "org/r3":
            continue
        rows.append(
            {
                "name": r,
                "version": "1.0.0",
                "upload_timestamp": 100,
                "classifiers": (
                    [] if r == "org/r4" else ["Framework :: Plone"]
                ),
            }
        )
    import pyarrow as _pa

    lookup = tk.PackageLookup(_pa.table({
        "name": [x["name"] for x in rows],
        "version": [x["version"] for x in rows],
        "upload_timestamp": [x["upload_timestamp"] for x in rows],
        "classifiers": [x["classifiers"] for x in rows],
    }))

    out = tk.refresh_all_indexed_packages(
        root, lookup, filter_classifiers=["Framework :: Plone"],
        apply_deletes=True,
    )
    assert out["stats"]["total"] == 7  # every repo has non-npm docs
    assert sorted(out["to_delete"]) == ["org/r3", "org/r4"]
    assert out["stats"]["deleted"] == 2
    assert out["stats"]["updated"] == 5
    assert out["stats"]["failed"] == 0
    # identifiers are {name}-{version}
    assert sorted(d["identifier"] for d in out["docs"]) == [
        f"org/r{i}-1.0.0" for i in (0, 1, 2, 5, 6)
    ]

    # npm documents of the deleted packages SURVIVE; everything else gone
    live = mf.read_alias(root)
    docs = ray.data.read_parquet(os.path.join(live, "docs")).to_pandas()
    for gone in ("org/r3", "org/r4"):
        langs = set(docs[docs["repo"] == gone]["lang"])
        assert langs == {"npm"}, (gone, langs)
    # untouched packages keep all their docs
    kept = docs[~docs["repo"].isin(["org/r3", "org/r4"])]
    expected = sum(
        1 for r in tbl["repo"].to_pylist() if r not in ("org/r3", "org/r4")
    )
    assert len(kept) == expected


def test_refresh_deletes_are_one_batched_rewrite(mixed_index):
    """Review fix: a refresh marking MULTIPLE packages for deletion
    performs exactly ONE tombstone-fold rewrite (one new version), not
    one per package — and a null-name row neither lists nor crashes
    the walk."""
    from pyf_aggregator_ray.pipelines import tasks as tk

    root, cfg, tbl = mixed_index
    versions_before = len(mf.list_versions(root))

    # registry serves only r0/r1/r2 with the classifier -> r3..r6 delete
    import pyarrow as _pa

    keep = [f"org/r{i}" for i in range(3)]
    lookup = tk.PackageLookup(_pa.table({
        "name": keep,
        "version": ["1.0.0"] * 3,
        "upload_timestamp": [100] * 3,
        "classifiers": [["Framework :: Plone"]] * 3,
    }))
    out = tk.refresh_all_indexed_packages(
        root, lookup, filter_classifiers=["Framework :: Plone"],
        apply_deletes=True,
    )
    assert sorted(out["to_delete"]) == [f"org/r{i}" for i in range(3, 7)]
    versions_after = len(mf.list_versions(root))
    assert versions_after == versions_before + 1  # ONE rewrite for all 4
    # refreshed docs passed clean_data (registry defaulted)
    for d in out["docs"]:
        assert d["registry"] == "pypi"


def test_unique_package_names_ignores_null_names(tmp_path, ray_session):
    tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(6, dtype=np.int64)),
            "repo": pa.array(["a/x", None, "b/y", None, "a/x", "b/y"]),
            "path": pa.array([f"p{i}.py" for i in range(6)]),
            "commit": pa.array([f"c{i:07d}" for i in range(6)]),
            "lang": pa.array(["pypi", "pypi", "npm", None, "pypi", "pypi"]),
            "content": pa.array([f"alpha doc{i}" for i in range(6)]),
        }
    )
    root = str(tmp_path / "root")
    build_index("", root, EngineConfig(), corpus=ray.data.from_arrow(tbl),
                num_parts=2)
    names = mx.unique_package_names(root, exclude_registry="npm")
    assert names == {"a/x", "b/y"}
    assert None not in mx.unique_package_names(root)
