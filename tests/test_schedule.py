"""Periodic-schedule surface: the reference's parse_crontab contract
(queue.py:1117-1137), its six default beat schedules (queue.py:31-41)
and env-override/disable semantics, evaluated deterministically."""

from datetime import datetime

from pyf_aggregator_ray.pipelines import schedule as sch


def test_parse_defaults_all_valid():
    for _name, _var, default in sch.JOB_DEFAULTS:
        assert sch.parse_crontab(default) is not None, default


def test_empty_and_malformed_disable():
    # reference: empty string disables; wrong field count warns+disables
    assert sch.parse_crontab("") is None
    assert sch.parse_crontab(None) is None
    assert sch.parse_crontab("   ") is None
    assert sch.parse_crontab("* * * *") is None          # 4 fields
    assert sch.parse_crontab("* * * * * *") is None      # 6 fields
    assert sch.parse_crontab("61 * * * *") is None       # out of range
    assert sch.parse_crontab("a * * * *") is None        # junk


def test_every_minute_default():
    spec = sch.parse_crontab("*/1 * * * *")
    assert spec.matches(datetime(2026, 8, 18, 12, 34))
    assert spec.matches(datetime(2026, 8, 18, 0, 0))


def test_weekly_refresh_sunday_2am():
    spec = sch.parse_crontab("0 2 * * 0")  # Sunday 02:00
    assert spec.matches(datetime(2026, 8, 16, 2, 0))      # a Sunday
    assert not spec.matches(datetime(2026, 8, 16, 2, 1))
    assert not spec.matches(datetime(2026, 8, 17, 2, 0))  # Monday
    # 7 aliases to Sunday (celery convention)
    assert sch.parse_crontab("0 2 * * 7").matches(datetime(2026, 8, 16, 2, 0))


def test_monthly_fetch_first_at_3am():
    spec = sch.parse_crontab("0 3 1 * *")
    assert spec.matches(datetime(2026, 9, 1, 3, 0))
    assert not spec.matches(datetime(2026, 9, 2, 3, 0))
    assert not spec.matches(datetime(2026, 9, 1, 4, 0))


def test_ranges_lists_and_steps():
    spec = sch.parse_crontab("0,30 9-17 * * 1-5")  # workday half-hours
    assert spec.matches(datetime(2026, 8, 18, 9, 30))    # Tuesday
    assert not spec.matches(datetime(2026, 8, 16, 9, 30))  # Sunday
    assert not spec.matches(datetime(2026, 8, 18, 8, 30))
    spec2 = sch.parse_crontab("*/15 */2 * * *")
    assert spec2.matches(datetime(2026, 8, 18, 2, 45))
    assert not spec2.matches(datetime(2026, 8, 18, 3, 45))


def test_due_jobs_default_env():
    # every minute: both RSS jobs; Sunday 02:00 adds the weekly refresh
    due = sch.due_jobs(datetime(2026, 8, 18, 12, 34), env={})
    assert due == ["rss_new_projects", "rss_new_releases"]
    due_sun = sch.due_jobs(datetime(2026, 8, 16, 2, 0), env={})
    assert "weekly_refresh" in due_sun and "rss_new_projects" in due_sun


def test_env_override_and_disable():
    env = {
        "CELERY_SCHEDULE_RSS_PROJECTS": "",          # disabled
        "CELERY_SCHEDULE_RSS_RELEASES": "*/5 * * * *",
    }
    scheds = sch.configured_schedules(env)
    assert "rss_new_projects" not in scheds
    assert sch.due_jobs(datetime(2026, 8, 18, 12, 35), env=env) == [
        "rss_new_releases"
    ]
    assert sch.due_jobs(datetime(2026, 8, 18, 12, 34), env=env) == []


def test_fires_between_counts():
    spec = sch.parse_crontab("*/1 * * * *")
    fires = sch.fires_between(
        spec, datetime(2026, 8, 18, 12, 0), datetime(2026, 8, 18, 12, 10)
    )
    assert len(fires) == 10
    weekly = sch.parse_crontab("0 2 * * 0")
    fires_w = sch.fires_between(
        weekly, datetime(2026, 8, 1), datetime(2026, 9, 1)
    )
    # August 2026 has 5 Sundays (2, 9, 16, 23, 30)
    assert len(fires_w) == 5
