"""Downloads-enrichment semantics, ported from the reference suite
(/root/reference/tests/test_downloads_enricher.py): payload
normalization (nulls -> 0), update-doc field shape (total only when
present), skip rules (no name / npm / no stats / limit), and per-name
memoization — against the batch stage analog."""

import pyarrow as pa

from pyf_aggregator_ray.pipelines import downloads as dl


def test_parse_recent_stats_nulls_to_zero():
    # test_handles_null_values_in_stats (ref :323-339)
    payload = {"data": {"last_day": None, "last_week": 100, "last_month": None}}
    out = dl.parse_recent_stats(payload, now_ts=5.0)
    assert out["downloads"]["last_day"] == 0
    assert out["downloads"]["last_week"] == 100
    assert out["downloads"]["last_month"] == 0
    assert out["downloads"]["total"] is None
    assert out["downloads"]["updated"] == 5.0


def test_parse_recent_stats_missing():
    # 404 / fetch failure analog -> {} (ref :149-160, :341-352)
    assert dl.parse_recent_stats(None, 0.0) == {}
    # missing data field -> zeros, not a crash (ref :306-321)
    out = dl.parse_recent_stats({"something": 1}, 0.0)
    assert out["downloads"]["last_day"] == 0


def test_update_fields_without_total():
    # test_updates_document_with_complete_data (ref :493-524): total None
    # must NOT appear in the patch
    from datetime import datetime

    updated = datetime(2023, 6, 15, 12, 30, 0)
    stats = {
        "downloads": {
            "last_day": 100, "last_week": 700, "last_month": 3000,
            "total": None, "updated": updated,
        }
    }
    doc = dl.downloads_update_fields(stats)
    assert doc["download_last_day"] == 100
    assert doc["download_last_week"] == 700
    assert doc["download_last_month"] == 3000
    assert doc["download_updated"] == updated.timestamp()
    assert "download_total" not in doc


def test_update_fields_with_total():
    stats = {
        "downloads": {
            "last_day": 1, "last_week": 7, "last_month": 30,
            "total": 50000, "updated": 1000.0,
        }
    }
    assert dl.downloads_update_fields(stats)["download_total"] == 50000


def _docs():
    return pa.table(
        {
            "id": ["a-1", "b-1", "c-1", "d-1", "e-1"],
            "name": ["alpha", "beta", None, "gamma", "alpha"],
            "registry": ["pypi", "npm", "pypi", "pypi", "pypi"],
        }
    )


def _source():
    return dl.TableStatsSource(
        {
            "alpha": {"data": {"last_day": 10, "last_week": 70, "last_month": 300}},
            # beta exists on pypistats too — the npm skip must fire FIRST
            "beta": {"data": {"last_day": 1, "last_week": 1, "last_month": 1}},
        },
        now_ts=42.0,
    )


def test_stage_skip_rules_and_updates():
    src = _source()
    stage = dl.DownloadsEnrichStage(src)
    out = stage(_docs()).to_pylist()
    by_id = {r["id"]: r for r in out}
    # alpha enriches with the normalized numbers
    assert by_id["a-1"]["status"] == "enriched"
    assert by_id["a-1"]["download_last_week"] == 70
    assert by_id["a-1"]["download_updated"] == 42.0
    assert by_id["a-1"]["download_total"] is None
    # npm package skipped EVEN THOUGH pypistats knows the name
    # (ref downloads.py:78-83 — wrong numbers would land on the npm doc)
    assert by_id["b-1"]["status"] == "skipped"
    assert by_id["b-1"]["reason"] == "npm_package"
    # no name
    assert by_id["c-1"]["reason"] == "no_name"
    # no stats for gamma
    assert by_id["d-1"]["reason"] == "no_stats"
    # second alpha row enriches again (doc-level update, not name-level)
    assert by_id["e-1"]["status"] == "enriched"


def test_stage_memoizes_per_name():
    # test_memoizes_api_results (ref :428-455): two docs of the same
    # package -> ONE stats lookup
    src = _source()
    stage = dl.DownloadsEnrichStage(src)
    stage(_docs())
    # names looked up: alpha (memoized on repeat), gamma; npm/no-name
    # never reach the source
    assert src.calls == 2


def test_stage_limit():
    # test_enriches_packages_with_limit (ref :619-651)
    src = _source()
    stage = dl.DownloadsEnrichStage(src, limit=1)
    out = stage(_docs()).to_pylist()
    statuses = [(r["id"], r["status"], r["reason"]) for r in out]
    assert ("a-1", "enriched", None) in statuses
    assert ("e-1", "skipped", "limit") in statuses


def test_stage_distributed(ray_session):
    import ray.data

    src = _source()
    out = (
        ray.data.from_arrow(_docs())
        .map_batches(
            dl.DownloadsEnrichStage,
            fn_constructor_args=(src,),
            batch_format="pyarrow",
            concurrency=1,
        )
        .to_pandas()
    )
    assert (out["status"] == "enriched").sum() == 2
    assert set(out.columns) == set(dl.UPDATE_SCHEMA.names)
