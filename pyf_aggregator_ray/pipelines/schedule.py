"""Periodic job schedule — the reference's Celery-beat surface, offline.

The reference registers six periodic jobs with env-tunable 5-field
crontabs (``/root/reference/src/pyf/aggregator/queue.py:30-49`` the
config, ``:1117-1137`` ``parse_crontab``, ``:1140-1207`` the beat
registration; an empty string disables a job, a malformed string is
logged and disables it). This engine has no long-lived beat process —
scheduling is driven externally (cron/Airflow/`ray job submit` in a
loop) — so the same contract is exposed as pure functions: parse the
crontab strings (same env variables, same defaults, same
empty/invalid-disables semantics), decide deterministically which jobs
are due at a given minute, and map each job name to the engine's batch
analog of the reference task.

| reference beat job (queue.py)          | engine analog                        |
| --------------------------------------- | ------------------------------------ |
| read RSS new projects and add to queue  | tasks.queue_from_feed(feed_type=new) |
| read RSS new releases and add to queue  | tasks.queue_from_feed(feed_type=release) |
| weekly refresh all indexed packages     | maintenance.refresh_merge            |
| monthly full fetch all packages         | build_index.build_index (full)       |
| weekly download stats enrichment        | tasks.enrich_all_profiles(downloads stage) (J2) |
| weekly GitHub data refresh              | tasks.enrich_all_profiles(enrich/doc-weights) (J1/J6) |
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from datetime import datetime


def _parse_field(field: str, lo: int, hi: int) -> frozenset[int] | None:
    """One crontab field -> allowed value set, or None on a malformed
    field. Supports '*', '*/n', 'a', 'a-b', 'a-b/n' and comma lists."""
    out: set[int] = set()
    for part in field.split(","):
        part = part.strip()
        if not part:
            return None
        step = 1
        if "/" in part:
            part, step_s = part.split("/", 1)
            if not step_s.isdigit() or int(step_s) < 1:
                return None
            step = int(step_s)
        if part == "*":
            lo_p, hi_p = lo, hi
        elif "-" in part:
            a, b = part.split("-", 1)
            if not (a.isdigit() and b.isdigit()):
                return None
            lo_p, hi_p = int(a), int(b)
        elif part.isdigit():
            lo_p = hi_p = int(part)
        else:
            return None
        if lo_p < lo or hi_p > hi or lo_p > hi_p:
            return None
        out.update(range(lo_p, hi_p + 1, step))
    return frozenset(out)


@dataclass(frozen=True)
class CronSpec:
    """Parsed 5-field crontab (minute hour day_of_month month
    day_of_week; day_of_week 0=Sunday, 7 aliases to 0 — the celery
    crontab convention the reference passes its fields into)."""

    minute: frozenset[int]
    hour: frozenset[int]
    day_of_month: frozenset[int]
    month: frozenset[int]
    day_of_week: frozenset[int]

    def matches(self, dt: datetime) -> bool:
        # python weekday(): Monday=0..Sunday=6; cron: Sunday=0..Saturday=6
        cron_dow = (dt.weekday() + 1) % 7
        return (
            dt.minute in self.minute
            and dt.hour in self.hour
            and dt.day in self.day_of_month
            and dt.month in self.month
            and cron_dow in self.day_of_week
        )


def parse_crontab(cron_string: str | None) -> CronSpec | None:
    """Same contract as the reference's parse_crontab
    (queue.py:1117-1137): None for empty (disabled) and for any
    malformed string (logged-and-disabled there; silently None here)."""
    if not cron_string or not cron_string.strip():
        return None
    parts = cron_string.strip().split()
    if len(parts) != 5:
        return None
    minute = _parse_field(parts[0], 0, 59)
    hour = _parse_field(parts[1], 0, 23)
    dom = _parse_field(parts[2], 1, 31)
    month = _parse_field(parts[3], 1, 12)
    dow = _parse_field(parts[4], 0, 7)
    if None in (minute, hour, dom, month, dow):
        return None
    if 7 in dow:  # 7 aliases to Sunday
        dow = frozenset((dow - {7}) | {0})
    return CronSpec(minute, hour, dom, month, dow)


# (job name, env var, reference default) — queue.py:31-41, names from
# the beat registration (queue.py:1140-1207)
JOB_DEFAULTS: list[tuple[str, str, str]] = [
    ("rss_new_projects", "CELERY_SCHEDULE_RSS_PROJECTS", "*/1 * * * *"),
    ("rss_new_releases", "CELERY_SCHEDULE_RSS_RELEASES", "*/1 * * * *"),
    ("weekly_refresh", "CELERY_SCHEDULE_WEEKLY_REFRESH", "0 2 * * 0"),
    ("monthly_full_fetch", "CELERY_SCHEDULE_MONTHLY_FETCH", "0 3 1 * *"),
    ("weekly_downloads", "CELERY_SCHEDULE_WEEKLY_DOWNLOADS", "0 4 * * 0"),
    ("weekly_github", "CELERY_SCHEDULE_WEEKLY_GITHUB", "0 5 * * 0"),
]


def configured_schedules(
    env: dict[str, str] | None = None,
) -> dict[str, CronSpec]:
    """Job name -> parsed schedule, honoring the same env overrides as
    the reference (empty string disables, malformed disables)."""
    env = os.environ if env is None else env
    out: dict[str, CronSpec] = {}
    for name, var, default in JOB_DEFAULTS:
        spec = parse_crontab(env.get(var, default))
        if spec is not None:
            out[name] = spec
    return out


def due_jobs(
    now: datetime, env: dict[str, str] | None = None
) -> list[str]:
    """Deterministic beat tick: the job names whose schedule matches the
    given minute, in registration order."""
    scheds = configured_schedules(env)
    return [name for name, _v, _d in JOB_DEFAULTS if name in scheds and scheds[name].matches(now)]


def fires_between(
    spec: CronSpec, start: datetime, end: datetime
) -> list[datetime]:
    """Every minute in [start, end) the spec fires at — bounded
    evaluation for tests and for catch-up after downtime (the analog of
    beat replaying a missed window)."""
    from datetime import timedelta

    cur = start.replace(second=0, microsecond=0)
    if cur < start:
        cur += timedelta(minutes=1)
    out = []
    while cur < end:
        if spec.matches(cur):
            out.append(cur)
        cur += timedelta(minutes=1)
    return out
