"""spark-submit entry point for the full KG-construction DAG.

    spark-submit --py-files <zip> ontonotes_5_parsing_spark/job.py \
        --n-pages 10000 --work-dir /data/kg_run --master local[32]

Runs web_pages → extract → parse → mentions → triples → linking →
canonicalize → nodes/edges with per-stage lineage manifests; a re-run
with the same --work-dir resumes completed stages (BASELINE.json:14).
Prints a one-line JSON summary with stage row counts and throughput.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--n-pages", type=int, default=1000,
                        help="synthetic corpus size (deterministic, seed 42)")
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--work-dir", type=str, default=None,
                        help="checkpoint dir; re-run resumes completed stages")
    parser.add_argument("--master", type=str, default=None,
                        help="override master (default local[$SPARK_GRAFT_CPUS])")
    parser.add_argument("--from-documents", type=str, default=None,
                        help="derive pages from <dir>/documents.parquet instead of --n-pages")
    args = parser.parse_args(argv)

    from ontonotes_5_parsing_spark.session import get_spark
    from ontonotes_5_parsing_spark import corpus
    from ontonotes_5_parsing_spark.pipeline import run_pipeline

    spark = get_spark(app_name="kg_construct", master=args.master)
    t0 = time.time()
    if args.from_documents:
        pages = corpus.web_pages_from_documents(spark, args.from_documents, args.seed)
    else:
        pages = corpus.web_pages_df(spark, args.n_pages, args.seed)
    out = run_pipeline(pages, work_dir=args.work_dir)
    counts = {
        name: out[name].count()
        for name in ("sentences", "mentions", "triples", "nodes", "edges")
    }
    wall = time.time() - t0
    summary = {
        "stages": counts,
        "wall_sec": round(wall, 2),
        "triples_per_sec": round(counts["triples"] / wall, 1),
        "work_dir": args.work_dir,
        "master": spark.sparkContext.master,
    }
    print(json.dumps(summary))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
