#!/usr/bin/env python
"""Benchmark harness: index-build throughput + BM25 query latency.

Default: one JSON line with headline seconds over $GRAFT_SF_DIR
(default /root/testdata/sf0.1) at $RAY_GRAFT_CPUS CPUs (default 32).

--scaling: runs the identical build+query job in two fresh processes at
8 and 32 CPUs on the same input and reports both throughputs plus
scaling efficiency = (t8/t32)/(32/8) — the sandbox stand-in for the
north rule's N vs 4N cluster-size criterion (see BASELINE.md).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time


def run_bench() -> dict:
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=num_cpus,
            include_dashboard=False,
            logging_level="ERROR",
        )
    import logging

    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    from pyf_aggregator_ray.pipelines.build_index import build_index
    from pyf_aggregator_ray.pipelines.query import QUERY_SET, IndexReader

    # warm the OS page cache so we measure compute+shuffle, not cold disk
    import pyarrow.parquet as pq

    pq.read_table(os.path.join(sf_dir, "documents.parquet"))

    index_root = f"/tmp/pyfa_bench_index_{os.getpid()}"
    shutil.rmtree(index_root, ignore_errors=True)
    t0 = time.perf_counter()
    manifest = build_index(sf_dir, index_root)
    build_sec = time.perf_counter() - t0

    reader = IndexReader(index_root)
    # warm once (postings read), then measure per-query latency
    for _, query, k in QUERY_SET:
        reader.score(query, k)
    lat = []
    for _ in range(5):
        for _, query, k in QUERY_SET:
            t = time.perf_counter()
            reader.score(query, k)
            lat.append(time.perf_counter() - t)
    lat.sort()
    p50 = lat[len(lat) // 2]
    p95 = lat[int(len(lat) * 0.95)]

    cold = IndexReader(index_root)
    t = time.perf_counter()
    for _, query, k in QUERY_SET:
        cold.score(query, k)
    cold_set_sec = time.perf_counter() - t

    stats = manifest["stats"]
    metrics = manifest["metrics"]
    result = {
        "metric": "index_build_sec",
        "value": round(build_sec, 3),
        "unit": "sec",
        "queries": {
            "index_build": round(build_sec, 3),
            "docs_pass": round(metrics["docs_pass_sec"], 3),
            "index_pass": round(metrics["index_pass_sec"], 3),
            "query_set_cold": round(cold_set_sec, 4),
            "query_p50": round(p50, 5),
            "query_p95": round(p95, 5),
        },
        "sf": sf_dir,
        "num_cpus": num_cpus,
        "docs": stats["num_docs"],
        "docs_per_sec": round(stats["num_docs"] / build_sec, 1),
        "postings": stats["total_postings"],
        "postings_per_sec": round(metrics["postings_per_sec"], 1),
        "index_bytes": metrics["index_bytes"],
        "approx_shuffled_bytes": metrics["approx_shuffled_bytes"],
        "num_hot_terms": metrics["num_hot_terms"],
    }
    shutil.rmtree(index_root, ignore_errors=True)
    ray.shutdown()
    return result


def run_at(ncpu: int) -> dict:
    env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__)],
        env=env,
        capture_output=True,
        text=True,
        check=True,
    ).stdout
    return json.loads(out.strip().splitlines()[-1])


def main() -> None:
    if "--scaling" in sys.argv:
        lo, hi = 8, 32
        r_lo, r_hi = run_at(lo), run_at(hi)
        t_lo, t_hi = r_lo["value"], r_hi["value"]
        eff = (t_lo / t_hi) / (hi / lo)
        print(
            json.dumps(
                {
                    "metric": "scaling_efficiency",
                    "value": round(eff, 3),
                    "unit": "ratio",
                    "sec_8": t_lo,
                    "sec_32": t_hi,
                    "docs_per_sec_8": r_lo["docs_per_sec"],
                    "docs_per_sec_32": r_hi["docs_per_sec"],
                    "queries": {
                        "build_8cpu": t_lo,
                        "build_32cpu": t_hi,
                        "query_p50_8cpu": r_lo["queries"]["query_p50"],
                        "query_p50_32cpu": r_hi["queries"]["query_p50"],
                    },
                    "sf": r_hi["sf"],
                }
            )
        )
        return
    print(json.dumps(run_bench()))


if __name__ == "__main__":
    main()
