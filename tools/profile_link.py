"""Profile the link/canonicalize stage sub-steps at a given sf_dir.

Usage: python tools/profile_link.py [--sf-dir /root/testdata/sf0.1] [--reps 3]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from ontonotes_5_parsing_spark.corpus import web_pages_from_documents
    from ontonotes_5_parsing_spark.pipeline.run import build_extraction
    from ontonotes_5_parsing_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="profile_link", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)
    pages_path = f"/tmp/profile_link_{os.getpid()}.parquet"
    web_pages_from_documents(spark, args.sf_dir).write.mode("overwrite").parquet(
        pages_path
    )
    from ontonotes_5_parsing_spark.corpus import read_web_pages

    best: dict[str, float] = {}

    def mark(name: str, t0: float) -> float:
        dt = time.time() - t0
        best[name] = min(best.get(name, float("inf")), dt)
        return time.time()

    for _ in range(args.reps):
        spark.catalog.clearCache()
        pages = read_web_pages(spark, pages_path)
        out = build_extraction(pages)
        out["triples"].count()
        mentions, triples = out["mentions"], out["triples"]

        from ontonotes_5_parsing_spark.pipeline.canonicalize import (
            build_nodes_edges,
        )
        from ontonotes_5_parsing_spark.pipeline.linking import (
            add_minhash_bands,
            candidate_pairs,
            connected_components,
            score_pairs,
            surface_vocab,
        )

        t = time.time()
        vocab = surface_vocab(mentions).persist()
        n_vocab = vocab.count()
        t = mark("vocab", t)
        banded = add_minhash_bands(vocab)
        pairs = score_pairs(candidate_pairs(banded)).persist()
        n_pairs = pairs.count()
        t = mark("pairs(band+join+score)", t)
        components = connected_components(vocab.select("vertex_id").distinct(), pairs)
        components.count()
        t = mark("components", t)
        from pyspark.sql import functions as F

        linked = vocab.join(components, "vertex_id", "left").withColumn(
            "component", F.coalesce("component", "vertex_id")
        )
        nodes, edges = build_nodes_edges(triples, linked)
        n_edges = edges.count()
        t = mark("nodes_edges", t)
        vocab.unpersist()
        pairs.unpersist()
        print(
            {"n_vocab": n_vocab, "n_pairs": n_pairs, "n_edges": n_edges},
            {k: round(v, 3) for k, v in best.items()},
        )
    total = sum(best.values())
    print("BEST:", {k: round(v, 3) for k, v in best.items()}, "total", round(total, 3))
    spark.stop()


if __name__ == "__main__":
    main()
