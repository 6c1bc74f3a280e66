"""Incremental task semantics — the reference's Celery task surface as
batch functions.

The reference drives its incremental path through Celery tasks with a
structured status contract (``/root/reference/src/pyf/aggregator/
queue.py:147-248`` ``inspect_project``, ``:250-330`` ``update_project``,
``:591-724`` the RSS feed readers): every outcome is a dict with
``status`` (skipped | indexed), a ``reason`` for skips (no package_id /
fetch_failed / no_plone_classifier / no_info), and identifiers of the
form ``{package_id}-{version}``. Partial failure is PER ENTRY — a bad
entry yields a skip row, it never aborts the run.

Here the same contract is an offline, batchable classification: the
"PyPI JSON fetch" is a lookup into a package-metadata table (a missing
package is the 404 analog), and the statuses come back as rows — one
per entry — from a ``map_batches`` stage, so a feed batch with broken
entries still indexes every good one (the Celery retry/partial-failure
semantics, minus the network). The RSS dedup-before-queue semantics
(Redis ``SET NX``; a dedup-store FAILURE queues anyway — availability
over exactly-once, ``queue.py:617-660``) are ``queue_from_feed``.
"""

from __future__ import annotations

import pyarrow as pa

from ..functions import transforms as tf
from .incremental import parse_feed_entry

PLONE_PREFIXES = ["Framework :: Plone"]


class PackageLookup:
    """The sandbox analog of the PyPI JSON API: (package_id[, release_id])
    -> package_json-shaped dict, backed by an Arrow packages table.
    Missing package/release == fetch failure (the 404 analog)."""

    def __init__(self, packages: pa.Table):
        self._rows: dict[tuple[str, str | None], dict] = {}
        self._latest: dict[str, dict] = {}
        for row in packages.to_pylist():
            name, version = row.get("name"), row.get("version")
            self._rows[(name, version)] = row
            cur = self._latest.get(name)
            ts = row.get("upload_timestamp") or 0
            if cur is None or ts >= (cur.get("upload_timestamp") or 0):
                self._latest[name] = row

    def get_json(self, package_id: str, release_id: str | None = None) -> dict | None:
        row = (
            self._rows.get((package_id, release_id))
            if release_id
            else self._latest.get(package_id)
        )
        if row is None:
            return None
        # package_json shape: info section + root-level urls
        info = dict(row)
        return {"info": info, "urls": info.pop("urls", []) or []}


def inspect_project(package_data: dict, lookup: PackageLookup) -> dict:
    """``inspect_project`` status contract (queue.py:147-248): fetch,
    require the Plone classifier, restructure, clean, return the indexed
    doc. Every failure is a structured skip — never an exception."""
    package_id = package_data.get("package_id")
    release_id = package_data.get("release_id")
    timestamp = package_data.get("timestamp")
    if not package_id:
        return {"status": "skipped", "reason": "no package_id"}
    package_json = lookup.get_json(package_id, release_id or None)
    if not package_json:
        return {
            "status": "skipped",
            "reason": "fetch_failed",
            "package_id": package_id,
        }
    info = package_json.get("info") or {}
    if not tf.has_classifier_prefix(info.get("classifiers"), PLONE_PREFIXES):
        return {
            "status": "skipped",
            "reason": "no_plone_classifier",
            "package_id": package_id,
        }
    data = tf.restructure_pypi_json(package_json)
    if data is None:
        return {"status": "skipped", "reason": "no_info", "package_id": package_id}
    # reference queue.py:222-226: the feed timestamp OVERRIDES whatever
    # restructure produced, coerced to int64; absent/falsy -> 0
    if timestamp:
        data["upload_timestamp"] = int(timestamp)
    else:
        data["upload_timestamp"] = 0
    version = data.get("version", "")
    identifier = f"{package_id}-{version}" if version else package_id
    data["id"] = identifier
    data["identifier"] = identifier
    data["name_sortable"] = data.get("name", package_id)
    data = tf.clean_data(data)
    return {
        "status": "indexed",
        "package_id": package_id,
        "identifier": identifier,
        "doc": data,
    }


def update_project(package_id: str | None, lookup: PackageLookup) -> dict:
    """``update_project`` (queue.py:250-330): same flow but NO Plone
    classifier check — the package is already known to be indexed."""
    if not package_id:
        return {"status": "skipped", "reason": "no package_id"}
    package_json = lookup.get_json(package_id)
    if not package_json:
        return {
            "status": "skipped",
            "reason": "fetch_failed",
            "package_id": package_id,
        }
    data = tf.restructure_pypi_json(package_json)
    if data is None:
        return {"status": "skipped", "reason": "no_info", "package_id": package_id}
    version = data.get("version", "")
    identifier = f"{package_id}-{version}" if version else package_id
    data["id"] = identifier
    data["identifier"] = identifier
    data["name_sortable"] = data.get("name", package_id)
    data = tf.clean_data(data)
    return {
        "status": "indexed",
        "package_id": package_id,
        "identifier": identifier,
        "doc": data,
    }


def _env_int(name: str, default: int) -> int:
    import os

    raw = os.getenv(name)
    return int(raw) if raw not in (None, "") else default


def rss_dedup_ttls() -> tuple[int, int]:
    """Per-feed-type dedup TTLs with the legacy fallback chain
    (queue.py:43-49): RSS_DEDUP_TTL_NEW / RSS_DEDUP_TTL_UPDATE each
    default to the legacy RSS_DEDUP_TTL, then to 86400. Read at call
    time (the reference reads at import; call-time keeps tests
    deterministic)."""
    import os

    legacy = os.getenv("RSS_DEDUP_TTL")
    legacy_int = int(legacy) if legacy not in (None, "") else 86400
    return (
        _env_int("RSS_DEDUP_TTL_NEW", legacy_int),
        _env_int("RSS_DEDUP_TTL_UPDATE", legacy_int),
    )


class SeenStore:
    """In-memory analog of the reference's Redis ``SET NX EX`` dedup
    store: ``set_nx_ex`` returns True exactly once per key per TTL
    window. ``fail=True`` simulates a store outage; ``clock`` injects a
    deterministic time source (TTL expiry without wall-clock sleeps)."""

    def __init__(self, fail: bool = False, clock=None):
        self._expiry: dict[str, float] = {}
        self.fail = fail
        self._clock = clock or (lambda: 0.0)
        self.last_ttl: int | None = None

    def set_nx_ex(self, key: str, ttl: int) -> bool:
        if self.fail:
            raise ConnectionError("dedup store unavailable")
        self.last_ttl = ttl
        now = self._clock()
        expires = self._expiry.get(key)
        if expires is not None and expires > now:
            return False
        self._expiry[key] = now + ttl
        return True

    # legacy shim used by older call sites/tests
    def mark_seen(self, key: str) -> bool:
        return self.set_nx_ex(key, 1 << 31)


def dedup_key(package_id: str, release_id=None, feed_type: str = "new") -> str:
    """Reference-verbatim key formats (queue.py:548-550,574-579):
    ``pyf:dedup:new:{id}``; update feeds append the release id when
    present so different versions of one package both queue. Any
    non-"new" feed type ("update", this engine's "release" alias) is
    update-style — the key prefix stays the reference's literal
    ``update``."""
    if feed_type != "new" and release_id:
        return f"pyf:dedup:update:{package_id}:{release_id}"
    if feed_type != "new":
        return f"pyf:dedup:update:{package_id}"
    return f"pyf:dedup:new:{package_id}"


def is_package_recently_queued(
    package_id: str,
    release_id=None,
    feed_type: str = "new",
    ttl: int | None = None,
    store: SeenStore | None = None,
) -> bool:
    """The reference's atomic check-and-mark (queue.py:539-588): True =
    duplicate within the TTL window (skip), False = new (proceed). TTL
    defaults per feed type; ``ttl == 0`` disables dedup entirely; a
    missing or failing store FAILS OPEN (returns False) so no package is
    ever dropped — the worker side is idempotent."""
    if ttl is None:
        ttl_new, ttl_update = rss_dedup_ttls()
        ttl = ttl_new if feed_type == "new" else ttl_update
    if ttl == 0:
        return False
    try:
        if store is None:
            return False
        was_set = store.set_nx_ex(
            dedup_key(package_id, release_id, feed_type), ttl
        )
        return not was_set
    except Exception:
        return False


def queue_from_feed(
    entries: list[dict],
    seen: SeenStore,
    feed_type: str = "new",
    filter_name: str | None = None,
) -> dict:
    """RSS feed -> queued work items, with the reference's semantics
    (queue.py:591-724): entries without a package id are skipped;
    already-seen keys are skipped and COUNTED; a dedup-store failure
    queues the entry anyway (availability over exactly-once — the worker
    side is idempotent). Returns {queued: [...], skipped: N,
    invalid: N}."""
    queued: list[dict] = []
    skipped = 0
    invalid = 0
    for entry in entries:
        parsed = parse_feed_entry(entry, filter_name)
        if parsed is None:
            invalid += 1
            continue
        if is_package_recently_queued(
            parsed["package_id"],
            parsed.get("release_id"),
            feed_type=feed_type,
            store=seen,
        ):
            skipped += 1
            continue
        queued.append(parsed)
    return {"queued": queued, "skipped": skipped, "invalid": invalid}


STATUS_SCHEMA = pa.schema(
    [
        ("package_id", pa.string()),
        ("status", pa.string()),
        ("reason", pa.string()),
        ("identifier", pa.string()),
    ]
)


class InspectStage:
    """map_batches stage: feed-entry rows -> status rows, one per entry
    (partial failure stays per row). The package table loads once per
    actor (``__init__``), entries classify vectorized-per-batch."""

    def __init__(self, packages: pa.Table, check_classifier: bool = True):
        self.lookup = PackageLookup(packages)
        self.check = check_classifier

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {k: [] for k in ("package_id", "status", "reason", "identifier")}
        for row in batch.to_pylist():
            res = (
                inspect_project(row, self.lookup)
                if self.check
                else update_project(row.get("package_id"), self.lookup)
            )
            out["package_id"].append(res.get("package_id"))
            out["status"].append(res["status"])
            out["reason"].append(res.get("reason"))
            out["identifier"].append(res.get("identifier"))
        return pa.table(
            {k: pa.array(v, pa.string()) for k, v in out.items()},
            schema=STATUS_SCHEMA,
        )


def enrich_all_profiles(run_one, profiles=None) -> dict:
    """The reference's all-profiles enrichment orchestration
    (``queue.py:1090-1111`` ``enrich_downloads_all_packages``): run the
    per-profile enricher for EVERY profile, isolating failures per
    profile — one failing profile is recorded as ``failed: <err>`` and
    the walk continues; the task itself always completes. ``run_one``
    is the per-profile runner (the downloads-enrichment stage, a GitHub
    refresh, ...) — injected so the same orchestration covers every
    weekly-enrichment beat job."""
    if profiles is None:
        from ..state.profiles import ProfileManager

        profiles = ProfileManager().list_profiles()
    results: dict[str, str] = {}
    for profile_name in profiles:
        try:
            run_one(profile_name)
            results[profile_name] = "completed"
        except Exception as e:  # noqa: BLE001 — per-profile isolation
            results[profile_name] = f"failed: {e}"
    return {"status": "completed", "profiles": results}


def refresh_all_indexed_packages(
    index_root: str,
    lookup: PackageLookup,
    filter_classifiers: list[str] | None = None,
    name_col: str = "repo",
    registry_col: str = "lang",
    keep_registry: str = "npm",
    apply_deletes: bool = False,
) -> dict:
    """The weekly-refresh orchestration (reference ``queue.py:783-970``
    ``refresh_all_indexed_packages``), with its npm-isolation contract:

    * the name walk EXCLUDES names whose documents all belong to
      ``keep_registry`` (they are not on PyPI — refreshing them would
      only ever mark them for deletion, ``queue.py:830-835``);
    * a package the registry no longer serves, or one that lost the
      required classifier, is marked for deletion — and the delete
      keeps ``keep_registry``'s documents (``queue.py:896-899``);
    * no-info packages are skipped, per-package errors are counted as
      failed and never abort the walk;
    * re-fetched docs get {name}-{version} identifiers; the preserved
      GitHub fields ride the refresh-merge pipeline (maintenance
      ``refresh_merge``), not this classifier.

    The name set is driver-held — bounded by distinct package names,
    exactly like the reference's materialized name list."""
    from .maintenance import (
        delete_packages_excluding_registry,
        unique_package_names,
    )

    names = unique_package_names(
        index_root,
        exclude_registry=keep_registry,
        name_col=name_col,
        registry_col=registry_col,
    )
    stats = {"total": len(names), "updated": 0, "deleted": 0,
             "failed": 0, "skipped": 0}
    to_delete: list[str] = []
    docs: list[dict] = []
    for name in sorted(names):
        try:
            package_json = lookup.get_json(name)
            if package_json is None:
                to_delete.append(name)
                stats["deleted"] += 1
                continue
            info = package_json.get("info") or {}
            if filter_classifiers and not tf.has_classifier_prefix(
                info.get("classifiers"), filter_classifiers
            ):
                to_delete.append(name)
                stats["deleted"] += 1
                continue
            data = tf.restructure_pypi_json(package_json)
            if data is None:
                stats["skipped"] += 1
                continue
            version = data.get("version", "")
            identifier = f"{name}-{version}" if version else name
            data["id"] = identifier
            data["identifier"] = identifier
            data["name_sortable"] = data.get("name", name)
            # same doc finalization as inspect/update: clean before it
            # rides the refresh-merge pipeline (None strings/lists and
            # comma-string keywords normalized, registry defaulted)
            docs.append(tf.clean_data(data))
            stats["updated"] += 1
        except Exception:
            stats["failed"] += 1
    if apply_deletes and to_delete:
        # ONE batched tombstone-fold for the whole delete list — not a
        # full index rewrite per package
        delete_packages_excluding_registry(
            index_root,
            to_delete,
            keep_registry,
            name_col=name_col,
            registry_col=registry_col,
        )
    return {"stats": stats, "to_delete": to_delete, "docs": docs}


def package_updates_since(
    feeds: list[list[dict]],
    since: int,
    filter_name: str | None = None,
) -> dict:
    """The reference's ``_package_updates`` (``fetcher.py:393-460``):
    merge raw entries from multiple RSS feeds (updates.xml +
    packages.xml), sort newest-first, and walk with the reference's
    exact skip order — already-seen package -> drop; timestamp older
    than ``since`` -> drop AND count (``dropped_by_since``); name
    filter; else yield (package_id, release_id, timestamp). A None
    timestamp is INCLUDED to be safe (the feeds hold only ~40 entries).
    ``dropped_by_since == 0`` is the overflow signal: the whole RSS
    window was newer than the last run, so updates between the oldest
    entry and ``since`` were likely missed (reconcile with a full
    fetch) — the inverse-logic cousin of incremental.py's
    dropped-NOTHING watermark warning."""
    parsed: list[dict] = []
    for entries in feeds:
        for entry in entries:
            p = parse_feed_entry(entry)
            if p is not None:
                parsed.append(p)
    parsed.sort(key=lambda p: p.get("timestamp") or 0, reverse=True)

    seen: set[str] = set()
    updates: list[tuple] = []
    dropped_by_since = 0
    for p in parsed:
        package_id = p.get("package_id")
        if not package_id or package_id in seen:
            continue
        timestamp = p.get("timestamp")
        if timestamp is not None and timestamp < since:
            dropped_by_since += 1
            continue
        if filter_name and filter_name not in package_id:
            continue
        seen.add(package_id)
        updates.append((package_id, p.get("release_id"), timestamp))
    return {"updates": updates, "dropped_by_since": dropped_by_since}
