"""Continuous interleaved scaling sampler (round-3 protocol).

The sandbox's ±3× CPU steal makes single scaling samples meaningless
(BENCH/BASELINE.md), so this loop interleaves spark-submit launches
across parallelism configs for as long as it is left running, appending
one JSON line per launch to --log. The best-of-per-config harvest and
the N→4N efficiency pairing happen offline (same-session pairings
preferred, per the round-2 protocol).

Touch /tmp/scaling_pause to make the loop idle (so foreground
measurements get a quiet machine); remove it to resume. Touch
/tmp/scaling_stop to exit after the in-flight launch.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools.scaling_bench import (  # noqa: E402
    hardware_curve,
    reference_throughput,
    spark_run,
)

PAUSE = "/tmp/scaling_pause"
STOP = "/tmp/scaling_stop"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-pages", type=int, default=100_000)
    ap.add_argument("--pages-parquet", default="/tmp/web_pages_bench.parquet")
    ap.add_argument("--log", default="/tmp/scaling_r3.jsonl")
    ap.add_argument("--max-rounds", type=int, default=40)
    args = ap.parse_args()

    if not os.path.exists(args.pages_parquet):
        from ontonotes_5_parsing_spark.corpus import write_web_pages_parquet
        from ontonotes_5_parsing_spark.session import get_spark

        spark = get_spark(app_name="materialize")
        write_web_pages_parquet(spark, args.n_pages, args.pages_parquet)
        spark.stop()

    def log(obj: dict) -> None:
        obj["t"] = round(time.time(), 1)
        obj["loadavg"] = round(os.getloadavg()[0], 2)
        with open(args.log, "a") as fh:
            fh.write(json.dumps(obj) + "\n")

    for rnd in range(args.max_rounds):
        for cores in (1, 4, 2, 8, 32):
            while os.path.exists(PAUSE) and not os.path.exists(STOP):
                time.sleep(20)
            if os.path.exists(STOP):
                return 0
            load0 = os.getloadavg()[0]
            try:
                r = spark_run(args.pages_parquet, cores, repeat=2)
            except Exception as exc:  # noqa: BLE001
                log({"cores": cores, "round": rnd, "err": str(exc)[:200]})
                continue
            r.update({"cores": cores, "round": rnd, "load_before": round(load0, 2)})
            log(r)
        # one reference + hardware probe per few rounds (same-window
        # pairing for the vs-reference ratio)
        if rnd % 3 == 0:
            while os.path.exists(PAUSE) and not os.path.exists(STOP):
                time.sleep(20)
            if os.path.exists(STOP):
                return 0
            ref = reference_throughput(args.pages_parquet)
            ref["kind"] = "reference"
            log(ref)
            hw = hardware_curve(n_pages=24000)
            log({"kind": "hardware", "curve": hw})
    return 0


if __name__ == "__main__":
    sys.exit(main())
