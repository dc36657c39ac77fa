"""Count Spark jobs triggered by the link/canonicalize stage — a
steal-independent proxy for sequential scheduling overhead.

Usage: python tools/count_link_jobs.py [--sf-dir /root/testdata/sf0.1]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, "/root/repo")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    from ontonotes_5_parsing_spark.corpus import (
        read_web_pages,
        web_pages_from_documents,
    )
    from ontonotes_5_parsing_spark.pipeline.run import build_extraction, build_graph
    from ontonotes_5_parsing_spark.session import get_spark

    spark = get_spark(app_name="count_link_jobs", master="local[8]",
                      shuffle_partitions=8,
                      extra_conf={"spark.ui.enabled": "true"})
    sc = spark.sparkContext
    pages_path = f"/tmp/count_jobs_{os.getpid()}.parquet"
    web_pages_from_documents(spark, args.sf_dir).write.mode("overwrite").parquet(
        pages_path
    )
    pages = read_web_pages(spark, pages_path)
    out = build_extraction(pages)
    out["triples"].count()

    tracker = sc.statusTracker()

    def phase_stats(name):
        jobs = tracker.getJobIdsForGroup(name) or []
        n_stages = n_tasks = 0
        for j in jobs:
            info = tracker.getJobInfo(j)
            if info:
                for st in info.stageIds:
                    si = tracker.getStageInfo(st)
                    if si:
                        n_stages += 1
                        n_tasks += si.numTasks
        return {"jobs": len(jobs), "stages": n_stages, "tasks": n_tasks}

    import time
    best = None
    for _ in range(3):
        spark.catalog.clearCache()
        t0 = time.time()
        sc.setJobGroup("build_graph", "")
        graph = build_graph(out["mentions"], out["triples"])
        n_edges = graph["edges"].count()
        sc.setJobGroup(None, None)
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    print({"n_edges": n_edges, "best_wall": round(best, 3),
           "build_graph": phase_stats("build_graph")})
    # per-job durations via the UI REST API (last rep only)
    try:
        import json as _json
        import urllib.request

        url = sc.uiWebUrl
        app = sc.applicationId
        data = _json.loads(
            urllib.request.urlopen(f"{url}/api/v1/applications/{app}/jobs").read()
        )
        from datetime import datetime

        def ms(j):
            fmt = "%Y-%m-%dT%H:%M:%S.%f%Z"
            t0 = datetime.strptime(j["submissionTime"], fmt)
            t1 = datetime.strptime(j["completionTime"], fmt)
            return (t1 - t0).total_seconds()

        jobs = [j for j in data if j.get("jobGroup") == "build_graph"]
        jobs.sort(key=lambda j: j["jobId"])
        for j in jobs[-9:]:
            print(j["jobId"], round(ms(j), 3), j["name"][:90])
    except Exception as exc:  # noqa: BLE001
        print("ui probe failed:", exc)
    spark.stop()


if __name__ == "__main__":
    main()
