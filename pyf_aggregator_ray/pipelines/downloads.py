"""Download-stats enrichment — the reference's pypistats enricher as a
batch stage.

The reference walks every indexed package (grouped, paginated search),
fetches pypistats "recent" numbers per package (memoized, rate-limited)
and patches four ``download_*`` fields onto the document
(``/root/reference/src/pyf/aggregator/enrichers/downloads.py:52-135``).
The transferable semantics, reproduced here verbatim:

* SKIP rules (``downloads.py:73-84``): packages without a ``name``;
  npm-registry packages (pypistats only knows PyPI — an npm query
  either 404s or writes the WRONG numbers onto the npm doc); packages
  whose stats lookup returns nothing; an optional global ``limit``.
* payload normalization (``downloads.py:190-202``): null counters
  coerce to 0 (``stats.get(k, 0) or 0``); ``total`` is None for the
  recent API; ``updated`` stamps the fetch time.
* update shape (``downloads.py:100-113``): ``download_last_day`` /
  ``_last_week`` / ``_last_month`` / ``download_updated`` (epoch
  seconds), plus ``download_total`` ONLY when total is not None.
* per-package memoization (``downloads.py:27-38``): one lookup per
  distinct package name per worker.

The network fetch is a ``StatsSource`` seam (here table-backed; a live
source would add the reference's retry/backoff around it and a
``TokenBucket`` for pacing); everything downstream of the seam is the
reference's logic and is what the tests pin.
"""

from __future__ import annotations

import pyarrow as pa


def parse_recent_stats(payload: dict | None, now_ts: float) -> dict:
    """pypistats ``/recent`` payload -> normalized stats, or {} for a
    missing package / failed fetch (the reference returns {} on
    404/error). Null counters coerce to 0."""
    if not payload:
        return {}
    stats = payload.get("data", {}) or {}
    return {
        "downloads": {
            "last_day": stats.get("last_day", 0) or 0,
            "last_week": stats.get("last_week", 0) or 0,
            "last_month": stats.get("last_month", 0) or 0,
            "total": None,  # the recent API doesn't provide totals
            "updated": now_ts,
        }
    }


def downloads_update_fields(stats: dict) -> dict:
    """Stats -> the document patch (reference ``update_doc``):
    ``download_total`` is included ONLY when total is present."""
    d = stats["downloads"]
    doc = {
        "download_last_day": d["last_day"],
        "download_last_week": d["last_week"],
        "download_last_month": d["last_month"],
        "download_updated": float(
            d["updated"].timestamp() if hasattr(d["updated"], "timestamp")
            else d["updated"]
        ),
    }
    if d.get("total") is not None:
        doc["download_total"] = d["total"]
    return doc


def skip_reason(doc: dict) -> str | None:
    """The reference's per-package skip rules, in its order."""
    if not doc.get("name"):
        return "no_name"
    if doc.get("registry") == "npm":
        return "npm_package"
    return None


class TableStatsSource:
    """The pypistats seam, backed by a (name -> recent payload) table —
    a missing name is the 404 analog. Counts lookups so memoization is
    testable."""

    def __init__(self, payloads: dict[str, dict], now_ts: float = 0.0):
        self._payloads = payloads
        self.now_ts = now_ts
        self.calls = 0

    def get(self, package_name: str) -> dict:
        self.calls += 1
        return parse_recent_stats(self._payloads.get(package_name), self.now_ts)


UPDATE_SCHEMA = pa.schema(
    [
        ("id", pa.string()),
        ("name", pa.string()),
        ("status", pa.string()),  # enriched | skipped
        ("reason", pa.string()),  # null for enriched
        ("download_last_day", pa.int64()),
        ("download_last_week", pa.int64()),
        ("download_last_month", pa.int64()),
        ("download_updated", pa.float64()),
        ("download_total", pa.int64()),  # null when the API has no total
    ]
)


class DownloadsEnrichStage:
    """map_batches stage: package-doc rows -> one status/update row per
    package. The stats source loads once per actor; per-name results
    memoize across the actor's batches (the reference's @memoize). The
    global ``limit`` (reference --limit) is enforced per actor-pool
    slice by the caller when needed; rows beyond ``limit`` in one
    stage's lifetime are marked skipped:limit."""

    def __init__(self, source: TableStatsSource, limit: int | None = None):
        self.source = source
        self.limit = limit
        self._memo: dict[str, dict] = {}
        self._enriched = 0

    def _stats(self, name: str) -> dict:
        if name not in self._memo:
            self._memo[name] = self.source.get(name)
        return self._memo[name]

    def __call__(self, batch: pa.Table) -> pa.Table:
        cols: dict[str, list] = {k: [] for k in UPDATE_SCHEMA.names}

        def emit(doc, status, reason=None, fields=None):
            f = fields or {}
            cols["id"].append(doc.get("id"))
            cols["name"].append(doc.get("name"))
            cols["status"].append(status)
            cols["reason"].append(reason)
            cols["download_last_day"].append(f.get("download_last_day"))
            cols["download_last_week"].append(f.get("download_last_week"))
            cols["download_last_month"].append(f.get("download_last_month"))
            cols["download_updated"].append(f.get("download_updated"))
            cols["download_total"].append(f.get("download_total"))

        for doc in batch.to_pylist():
            reason = skip_reason(doc)
            if reason:
                emit(doc, "skipped", reason)
                continue
            if self.limit is not None and self._enriched >= self.limit:
                emit(doc, "skipped", "limit")
                continue
            stats = self._stats(doc["name"])
            if not stats:
                emit(doc, "skipped", "no_stats")
                continue
            self._enriched += 1
            emit(doc, "enriched", None, downloads_update_fields(stats))
        return pa.table(
            {k: pa.array(v) for k, v in cols.items()}, schema=UPDATE_SCHEMA
        )
