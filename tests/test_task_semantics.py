"""The reference's Celery task status matrix, ported offline
(/root/reference/tests/test_queue.py:142-657): inspect_project /
update_project outcome taxonomy, identifier construction, the
no-classifier-check property of updates, RSS queue dedup counting, and
dedup-failure-allows-queueing — against this engine's batch analogs."""

import pyarrow as pa
import pytest

from pyf_aggregator_ray.pipelines import tasks as tk


def _packages() -> pa.Table:
    return pa.table(
        {
            "name": ["plone.api", "plone.api", "requests", "broken"],
            "version": ["1.0.0", "2.0.0", "2.31.0", ""],
            "classifiers": [
                ["Framework :: Plone :: 6.0"],
                ["Framework :: Plone"],
                ["Programming Language :: Python :: 3"],
                ["Framework :: Plone"],
            ],
            "upload_timestamp": [100, 200, 300, 50],
            "summary": ["api", "api", "http", None],
            "keywords": ["plone, api", None, "http requests", None],
        }
    )


@pytest.fixture(scope="module")
def lookup():
    return tk.PackageLookup(_packages())


# --- inspect_project (test_queue.py:142-320) ---


def test_skips_when_no_package_id(lookup):
    res = tk.inspect_project({}, lookup)
    assert res["status"] == "skipped"
    assert res["reason"] == "no package_id"


def test_skips_non_plone_package(lookup):
    res = tk.inspect_project({"package_id": "requests"}, lookup)
    assert res["status"] == "skipped"
    assert res["reason"] == "no_plone_classifier"
    assert res["package_id"] == "requests"


def test_indexes_plone_package(lookup):
    res = tk.inspect_project({"package_id": "plone.api"}, lookup)
    assert res["status"] == "indexed"
    assert res["package_id"] == "plone.api"
    assert "identifier" in res
    # latest release wins when no release_id given
    assert res["identifier"] == "plone.api-2.0.0"


def test_handles_fetch_failure(lookup):
    res = tk.inspect_project({"package_id": "nonexistent"}, lookup)
    assert res["status"] == "skipped"
    assert res["reason"] == "fetch_failed"


def test_uses_release_id_when_provided(lookup):
    res = tk.inspect_project(
        {"package_id": "plone.api", "release_id": "1.0.0"}, lookup
    )
    assert res["status"] == "indexed"
    assert res["identifier"] == "plone.api-1.0.0"


def test_sets_id_identifier_and_name_sortable(lookup):
    res = tk.inspect_project({"package_id": "plone.api"}, lookup)
    doc = res["doc"]
    assert doc["id"] == doc["identifier"] == "plone.api-2.0.0"
    assert doc["name_sortable"] == "plone.api"
    # clean_data ran: keyword string -> list
    assert doc["keywords"] == []  # None keywords on the 2.0.0 row -> []


def test_identifier_without_version_is_bare_package_id(lookup):
    res = tk.update_project("broken", lookup)
    assert res["status"] == "indexed"
    assert res["identifier"] == "broken"  # empty version -> no suffix


# --- update_project (test_queue.py:322-400) ---


def test_update_skips_when_no_package_id(lookup):
    res = tk.update_project(None, lookup)
    assert res["status"] == "skipped"
    assert res["reason"] == "no package_id"


def test_update_does_not_check_plone_classifier(lookup):
    """Unlike inspect, update assumes the package is already known
    (test_queue.py:360-381) — a non-Plone package still indexes."""
    res = tk.update_project("requests", lookup)
    assert res["status"] == "indexed"
    assert res["identifier"] == "requests-2.31.0"


def test_update_handles_fetch_failure(lookup):
    res = tk.update_project("nonexistent", lookup)
    assert res["status"] == "skipped"
    assert res["reason"] == "fetch_failed"


# --- RSS queue + dedup (test_queue.py:402-823) ---


def _feed(n=3, pkg="pkg"):
    return [
        {
            "title": f"{pkg}{i} added to PyPI",
            "link": f"https://pypi.org/project/{pkg}{i}/",
            "published_parsed": 1_700_000_000 + i,
        }
        for i in range(n)
    ]


def test_queues_packages_from_rss():
    out = tk.queue_from_feed(_feed(3), tk.SeenStore(), feed_type="new")
    assert len(out["queued"]) == 3
    assert out["skipped"] == 0
    assert {q["package_id"] for q in out["queued"]} == {"pkg0", "pkg1", "pkg2"}


def test_returns_zero_when_empty_feed():
    out = tk.queue_from_feed([], tk.SeenStore(), feed_type="new")
    assert out == {"queued": [], "skipped": 0, "invalid": 0}


def test_skips_entries_without_package_id():
    entries = _feed(2) + [{"title": "", "link": ""}]
    out = tk.queue_from_feed(entries, tk.SeenStore(), feed_type="new")
    assert len(out["queued"]) == 2
    assert out["invalid"] == 1


def test_skips_duplicate_packages_and_counts():
    seen = tk.SeenStore()
    first = tk.queue_from_feed(_feed(3), seen, feed_type="new")
    assert len(first["queued"]) == 3
    again = tk.queue_from_feed(_feed(3) + _feed(1, pkg="other"), seen, "new")
    assert len(again["queued"]) == 1
    assert again["skipped"] == 3  # skipped count surfaces in the result


def test_dedup_failure_allows_queueing():
    """A dedup-store outage must not drop work — entries queue anyway
    (test_queue.py:588-616)."""
    out = tk.queue_from_feed(_feed(2), tk.SeenStore(fail=True), "new")
    assert len(out["queued"]) == 2
    assert out["skipped"] == 0


def test_release_feed_dedups_on_package_and_release():
    """Release feeds key on (package, release): the same package with a
    NEW release queues again (test_queue.py:789-823)."""
    seen = tk.SeenStore()
    e1 = {"title": "pkg 1.0.0", "link": "https://pypi.org/project/pkg/1.0.0/"}
    e2 = {"title": "pkg 1.0.1", "link": "https://pypi.org/project/pkg/1.0.1/"}
    out1 = tk.queue_from_feed([e1], seen, feed_type="release")
    out2 = tk.queue_from_feed([e1, e2], seen, feed_type="release")
    assert len(out1["queued"]) == 1
    assert len(out2["queued"]) == 1
    assert out2["queued"][0]["release_id"] == "1.0.1"
    assert out2["skipped"] == 1


# --- distributed stage: partial failure stays per row ---


def test_inspect_stage_partial_failure(ray_session):
    """One map_batches pass classifies good, non-Plone, missing and
    id-less entries in the SAME batch — bad rows become skip rows, the
    good row still indexes (the Celery per-task isolation, batched)."""
    import ray.data

    entries = pa.table(
        {
            "package_id": ["plone.api", "requests", "nonexistent", None],
            "release_id": [None, None, None, None],
            "timestamp": [None, None, None, None],
        }
    )
    out = (
        ray.data.from_arrow(entries)
        .map_batches(
            tk.InspectStage,
            fn_constructor_args=(_packages(),),
            batch_format="pyarrow",
            concurrency=1,
        )
        .to_pandas()
        .set_index("package_id")
    )
    assert out.loc["plone.api", "status"] == "indexed"
    assert out.loc["requests", "reason"] == "no_plone_classifier"
    assert out.loc["nonexistent", "reason"] == "fetch_failed"
    assert (out["status"] == "indexed").sum() == 1


class TestRSSDeduplication:
    """Reference test_queue.py:1532-1710 — the SET NX EX dedup contract
    over the in-memory store analog (pipelines/tk.py): key formats,
    per-feed-type TTL defaults, ttl=0 disable, TTL expiry, fail-open."""

    def test_first_check_returns_false(self):
        store = tk.SeenStore()
        assert (
            tk.is_package_recently_queued("new-package", store=store)
            is False
        )
        # reference key format + default NEW ttl (queue.py:579,563-564)
        assert "pyf:dedup:new:new-package" in store._expiry
        assert store.last_ttl == tk.rss_dedup_ttls()[0]

    def test_duplicate_check_returns_true(self):
        store = tk.SeenStore()
        assert tk.is_package_recently_queued("existing", store=store) is False
        assert tk.is_package_recently_queued("existing", store=store) is True

    def test_store_unavailable_returns_false(self):
        # fail-open: no store at all
        assert tk.is_package_recently_queued("pkg", store=None) is False

    def test_store_error_returns_false(self):
        assert (
            tk.is_package_recently_queued(
                "pkg", store=tk.SeenStore(fail=True)
            )
            is False
        )

    def test_custom_ttl_is_used(self):
        store = tk.SeenStore()
        tk.is_package_recently_queued("pkg", ttl=999, store=store)
        assert store.last_ttl == 999

    def test_ttl_zero_disables_dedup(self):
        store = tk.SeenStore()
        for _ in range(3):
            assert (
                tk.is_package_recently_queued("pkg", ttl=0, store=store)
                is False
            )
        assert store._expiry == {}  # never touched the store

    def test_ttl_expiry_allows_requeue(self):
        # the EX in SET NX EX: after the window the same key queues again
        clock = {"t": 0.0}
        store = tk.SeenStore(clock=lambda: clock["t"])
        assert tk.is_package_recently_queued("pkg", ttl=60, store=store) is False
        assert tk.is_package_recently_queued("pkg", ttl=60, store=store) is True
        clock["t"] = 61.0
        assert tk.is_package_recently_queued("pkg", ttl=60, store=store) is False

    def test_dedup_key_format(self):
        assert tk.dedup_key("foo") == "pyf:dedup:new:foo"

    def test_new_package_dedup_key_uses_new_prefix(self):
        assert tk.dedup_key("foo", feed_type="new") == "pyf:dedup:new:foo"

    def test_update_dedup_key_includes_release_id(self):
        assert (
            tk.dedup_key("foo", "1.0", feed_type="update")
            == "pyf:dedup:update:foo:1.0"
        )

    def test_update_without_release_id_falls_back(self):
        assert (
            tk.dedup_key("foo", feed_type="update") == "pyf:dedup:update:foo"
        )

    def test_different_versions_not_deduplicated(self):
        store = tk.SeenStore()
        assert (
            tk.is_package_recently_queued(
                "foo", release_id="1.0", feed_type="update", store=store
            )
            is False
        )
        assert (
            tk.is_package_recently_queued(
                "foo", release_id="2.0", feed_type="update", store=store
            )
            is False
        )
        assert "pyf:dedup:update:foo:1.0" in store._expiry
        assert "pyf:dedup:update:foo:2.0" in store._expiry

    def test_default_feed_type_is_new(self):
        store = tk.SeenStore()
        tk.is_package_recently_queued("some-pkg", store=store)
        assert "pyf:dedup:new:some-pkg" in store._expiry

    def test_new_feed_uses_new_ttl(self, monkeypatch):
        monkeypatch.setenv("RSS_DEDUP_TTL_NEW", "111")
        monkeypatch.setenv("RSS_DEDUP_TTL_UPDATE", "222")
        store = tk.SeenStore()
        tk.is_package_recently_queued("pkg", feed_type="new", store=store)
        assert store.last_ttl == 111

    def test_update_feed_uses_update_ttl(self, monkeypatch):
        monkeypatch.setenv("RSS_DEDUP_TTL_NEW", "111")
        monkeypatch.setenv("RSS_DEDUP_TTL_UPDATE", "222")
        store = tk.SeenStore()
        tk.is_package_recently_queued("pkg", feed_type="update", store=store)
        assert store.last_ttl == 222

    def test_explicit_ttl_overrides_feed_type_default(self, monkeypatch):
        monkeypatch.setenv("RSS_DEDUP_TTL_NEW", "111")
        store = tk.SeenStore()
        tk.is_package_recently_queued("pkg", feed_type="new", ttl=999, store=store)
        assert store.last_ttl == 999

    def test_legacy_ttl_env_is_fallback_for_both(self, monkeypatch):
        # queue.py:45-49: RSS_DEDUP_TTL backfills both feed types
        monkeypatch.delenv("RSS_DEDUP_TTL_NEW", raising=False)
        monkeypatch.delenv("RSS_DEDUP_TTL_UPDATE", raising=False)
        monkeypatch.setenv("RSS_DEDUP_TTL", "333")
        assert tk.rss_dedup_ttls() == (333, 333)

    def test_default_ttls_are_86400(self, monkeypatch):
        for var in ("RSS_DEDUP_TTL", "RSS_DEDUP_TTL_NEW", "RSS_DEDUP_TTL_UPDATE"):
            monkeypatch.delenv(var, raising=False)
        assert tk.rss_dedup_ttls() == (86400, 86400)


class TestInspectTimestampSemantics:
    """Reference queue.py:222-226 (test_queue.py:1846-1884): the feed
    timestamp overrides the fetched doc's value as int64; absent -> 0."""

    def test_float_timestamp_coerced_to_int(self, lookup):
        res = tk.inspect_project(
            {"package_id": "plone.api", "timestamp": 1686700000.5}, lookup
        )
        assert res["status"] == "indexed"
        assert res["doc"]["upload_timestamp"] == 1686700000
        assert isinstance(res["doc"]["upload_timestamp"], int)

    def test_timestamp_overrides_table_value(self, lookup):
        res = tk.inspect_project(
            {"package_id": "plone.api", "timestamp": 42}, lookup
        )
        assert res["doc"]["upload_timestamp"] == 42

    def test_missing_timestamp_is_zero(self, lookup):
        res = tk.inspect_project({"package_id": "plone.api"}, lookup)
        assert res["doc"]["upload_timestamp"] == 0

    def test_zero_timestamp_is_zero(self, lookup):
        # falsy timestamps take the 0 branch, exactly like the reference
        res = tk.inspect_project(
            {"package_id": "plone.api", "timestamp": 0.0}, lookup
        )
        assert res["doc"]["upload_timestamp"] == 0


class TestEnrichAllProfiles:
    """Reference test_queue.py:1957-2013 — all-profiles enrichment with
    per-profile failure isolation."""

    def test_enriches_all_profiles(self):
        ran = []
        out = tk.enrich_all_profiles(ran.append, profiles=["plone", "django"])
        assert out["status"] == "completed"
        assert out["profiles"] == {"plone": "completed", "django": "completed"}
        assert ran == ["plone", "django"]

    def test_handles_enricher_error(self):
        def run_one(name):
            raise RuntimeError("API error")

        out = tk.enrich_all_profiles(run_one, profiles=["plone"])
        assert out["status"] == "completed"
        assert out["profiles"]["plone"].startswith("failed:")
        assert "API error" in out["profiles"]["plone"]

    def test_failure_does_not_stop_the_walk(self):
        def run_one(name):
            if name == "plone":
                raise RuntimeError("boom")

        out = tk.enrich_all_profiles(run_one, profiles=["plone", "django"])
        assert out["profiles"]["plone"].startswith("failed:")
        assert out["profiles"]["django"] == "completed"

    def test_defaults_to_builtin_profile_list(self):
        ran = []
        out = tk.enrich_all_profiles(ran.append)
        assert sorted(ran) == ["django", "flask", "plone"]
        assert out["status"] == "completed"


class TestPackageUpdatesSince:
    """Reference fetcher.py:393-460 (test_fetcher.py:554-613) — the
    incremental feed merge: newest-first dedup, since cutoff with
    dropped counter (the overflow signal), None-timestamp inclusion,
    name filter after the cutoff."""

    def _entry(self, pkg, ver, ts):
        e = {
            "title": f"{pkg} {ver}" if ver else f"{pkg} added to PyPI",
            "link": (
                f"https://pypi.org/project/{pkg}/{ver}/"
                if ver
                else f"https://pypi.org/project/{pkg}/"
            ),
        }
        if ts is not None:
            e["published_parsed"] = ts  # numeric epoch passes through
        return e

    def test_yields_unique_packages(self):
        feeds = [
            [self._entry("plone.api", "2.0.0", 200)],
            [self._entry("requests", "2.31.0", 100)],
        ]
        out = tk.package_updates_since(feeds, since=0)
        ids = [u[0] for u in out["updates"]]
        assert ids == ["plone.api", "requests"]  # newest first
        assert len(set(ids)) == len(ids)

    def test_deduplicates_across_feeds_newest_wins(self):
        feeds = [
            [self._entry("plone.api", "2.0.0", 200)],
            [self._entry("plone.api", "1.9.0", 150)],
        ]
        out = tk.package_updates_since(feeds, since=0)
        assert out["updates"] == [("plone.api", "2.0.0", 200)]

    def test_since_cutoff_drops_and_counts(self):
        feeds = [[
            self._entry("new.pkg", "1.0", 500),
            self._entry("old.pkg", "1.0", 100),
        ]]
        out = tk.package_updates_since(feeds, since=300)
        assert [u[0] for u in out["updates"]] == ["new.pkg"]
        assert out["dropped_by_since"] == 1

    def test_none_timestamp_included_to_be_safe(self):
        feeds = [[self._entry("no.ts", "1.0", None)]]
        out = tk.package_updates_since(feeds, since=10**9)
        assert out["updates"] == [("no.ts", "1.0", None)]
        assert out["dropped_by_since"] == 0

    def test_name_filter_applied_after_cutoff(self):
        feeds = [[
            self._entry("plone.api", "1.0", 500),
            self._entry("requests", "1.0", 500),
            self._entry("plone.old", "1.0", 100),  # dropped by since
        ]]
        out = tk.package_updates_since(feeds, since=300, filter_name="plone")
        assert [u[0] for u in out["updates"]] == ["plone.api"]
        # the non-matching dropped-by-since entry still counted
        assert out["dropped_by_since"] == 1

    def test_zero_dropped_is_the_overflow_signal(self):
        # every entry newer than since -> the window likely overflowed
        feeds = [[self._entry("a", "1.0", 900), self._entry("b", "1.0", 800)]]
        out = tk.package_updates_since(feeds, since=100)
        assert out["dropped_by_since"] == 0
