"""Drop-in CLI for users of the reference's three console scripts
(/root/reference/setup.py:61-67), distributed on Spark:

    spark-submit --py-files pkg.zip -m ... (or python -m) \
      ontonotes_5_parsing_spark.cli to_json  -s corpus(.tgz|dir) -d out_dir [-i ids_dir] [-r seed]
      ontonotes_5_parsing_spark.cli reduce_entities -s in_dir -d out_dir -n N
      ontonotes_5_parsing_spark.cli show_statistics -s in_dir

Flag names/letters match the reference's argparse surface
(`ontonotes5_to_json.py:17-50`, `reduce_entities.py:23-48`,
`show_statistics.py:8-17`). Two deliberate departures, both Spark-
native: datasets are *directories* of split-partitioned JSON (a
distributed sink cannot be one file), and the seeded shuffle is a
keyed hash (`xxhash64(doc, sent, seed)`) so output is byte-stable at
any parallelism (SURVEY.md §7 hard part 6). A third departure: when
-r/--random is omitted, the reference shuffles UNSEEDED
(ontonotes5_to_json.py:205-207); here the shuffle defaults to seed 42 —
a keyed-hash sink has no "unseeded" mode, and a deterministic default
makes re-runs reproducible by construction.
"""

from __future__ import annotations

import argparse
import atexit
import json
import os
import shutil
import sys
import tarfile
import tempfile


def _spark(app: str):
    from .session import get_spark

    return get_spark(app_name=app)


def _resolve_corpus(src: str) -> str:
    """Accept the reference's .tgz corpus or an already-extracted dir.

    A tgz is extracted once, driver-side, to a temp dir (the reference
    spools members through temp files too, ontonotes5_to_json.py:97-104);
    at real scale the corpus lives extracted on shared storage and this
    branch never runs.
    """
    if os.path.isdir(src):
        return src
    if src.endswith((".tgz", ".tar.gz", ".tar")):
        out = tempfile.mkdtemp(prefix="onf_corpus_")
        # remove the extracted tree when the job process exits (the
        # reference deletes its per-member temp spool files too,
        # ontonotes5_to_json.py:97-104) — without this every .tgz
        # invocation leaks a full corpus copy under /tmp
        atexit.register(shutil.rmtree, out, True)
        with tarfile.open(src) as tf:
            tf.extractall(out, filter="data")
        return out
    raise SystemExit(f"source {src!r} is neither a directory nor a tar archive")


def cmd_to_json(args: argparse.Namespace) -> int:
    from .sources.onf import onf_to_json

    spark = _spark("onf_to_json")
    stats = onf_to_json(
        spark,
        _resolve_corpus(args.source_file),
        args.train_dev_test_ids,
        args.dst_file,
        seed=args.random_seed if args.random_seed is not None else 42,
    )
    print(json.dumps(stats))
    return 0


def cmd_reduce_entities(args: argparse.Namespace) -> int:
    from .pipeline.dataset_io import read_json_dataset
    from .pipeline.reduce_labels import reduce_labels

    spark = _spark("reduce_entities")
    ds, obs = read_json_dataset(spark, args.source_file)
    reduced, rules = reduce_labels(ds, args.maximal_number_of_entity_types)
    (
        reduced.write.mode("overwrite")
        .partitionBy("split")
        .json(args.dst_file)
    )
    print(
        json.dumps(
            {
                "rules": rules,
                "n_rows": obs.get["n_rows"],
                "n_invalid": obs.get["n_invalid"],
            }
        )
    )
    return 0


def cmd_show_statistics(args: argparse.Namespace) -> int:
    from .pipeline.dataset_io import read_json_dataset
    from .pipeline.statistics import entity_frequencies, language_frequencies

    spark = _spark("show_statistics")
    ds, _obs = read_json_dataset(spark, args.source_file)
    ds = ds.persist()
    langs = language_frequencies(ds).collect()
    report = {"languages": [r.asDict() for r in langs], "entities": {}}
    for row in langs:
        report["entities"][row.language] = [
            r.asDict() for r in entity_frequencies(ds, row.language).collect()
        ]
    print(json.dumps(report))
    return 0


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="ontonotes_5_parsing_spark.cli")
    sub = parser.add_subparsers(dest="command", required=True)

    p = sub.add_parser("to_json", help="corpus → split-partitioned JSON dataset")
    p.add_argument("-s", "--src", dest="source_file", required=True,
                   help="source corpus: .tgz of *.onf files or extracted dir")
    p.add_argument("-d", "--dst", dest="dst_file", required=True,
                   help="destination dataset directory (split-partitioned JSON)")
    p.add_argument("-i", "--ids", dest="train_dev_test_ids", default=None,
                   help="directory of train/development/test id lists")
    p.add_argument("-r", "--random", dest="random_seed", type=int, default=None,
                   help="shuffle seed")
    p.set_defaults(fn=cmd_to_json)

    p = sub.add_parser("reduce_entities", help="cluster + canonicalize labels")
    p.add_argument("-s", "--src", dest="source_file", required=True)
    p.add_argument("-d", "--dst", dest="dst_file", required=True)
    p.add_argument("-n", "--number", dest="maximal_number_of_entity_types",
                   type=int, required=True,
                   help="maximal number of entity types kept as cluster seeds")
    p.set_defaults(fn=cmd_reduce_entities)

    p = sub.add_parser("show_statistics", help="per-language / per-type counts")
    p.add_argument("-s", "--src", dest="source_file", required=True)
    p.set_defaults(fn=cmd_show_statistics)

    args = parser.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
