"""Label-vocabulary reduction — the distributed `reduce_entities`
(SURVEY.md §3.2; /root/reference/reduce_entities.py).

Lifecycle, stage for stage:

1. global label frequency over the annotations table (A3,
   reduce_entities.py:64-86) — salted two-phase groupBy;
2. top-N seeds by (freq desc, label) (A4, :91-98);
3. nearest-seed assignment for remaining labels by the hierarchical
   label distance (J2, :99-106) — the label table is tiny (the
   reference collects it too), so rules are computed driver-side with
   kgref.find_nearest_label and broadcast;
4. canonical per cluster = min (len, label) (A5, :108-116);
5. rewrite pass: relabel every annotation map key through the rules and
   merge span lists that collide on the same new key with interval
   union (F12, utils.py:1002-1044 via insert_new_bounds semantics) —
   map-side only, no shuffle (reduce_entities.py:137-180).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..kgref.distance import find_nearest_label

_SPAN_ARR = "array<struct<start:bigint,end:bigint>>"


def label_frequencies(annotations: DataFrame) -> DataFrame:
    """(label, freq): total span count per entity label (A3, salted)."""
    exploded = annotations.select(
        F.explode("entities").alias("label", "spans"),
        F.xxhash64("url", "sent_idx").alias("h"),
    ).select("label", F.size("spans").alias("n"), F.pmod("h", F.lit(32)).alias("salt"))
    partial = exploded.groupBy("label", "salt").agg(F.sum("n").alias("cnt"))
    return partial.groupBy("label").agg(F.sum("cnt").alias("freq"))


def build_rules(freq: DataFrame, n_seeds: int = 10) -> dict[str, str]:
    """label → canonical-cluster-seed rules (A4 + J2 + A5).

    The label vocabulary is tiny at any corpus scale (it is bounded by
    the annotation scheme, not the data), so this is the reference's
    own collect boundary (reduce_entities.py:88-116).
    """
    rows = freq.orderBy(F.desc("freq"), "label").collect()
    if not rows:
        return {}
    labels = [r["label"] for r in rows]
    seeds = labels[: min(n_seeds, len(labels))]
    clusters: dict[str, list[str]] = {s: [s] for s in seeds}
    for label in labels[len(seeds):]:
        seed = seeds[find_nearest_label(label, seeds)]
        clusters[seed].append(label)
    rules: dict[str, str] = {}
    for members in clusters.values():
        canonical = min(members, key=lambda lbl: (len(lbl), lbl))
        for m in members:
            rules[m] = canonical
    return rules


def apply_rules(annotations: DataFrame, rules: dict[str, str]) -> DataFrame:
    """Rewrite the entities map through the rules, uniting span lists
    that collide on one new key — all map-side higher-order functions
    (transform_keys analog + F12 interval union), zero shuffle per row
    beyond the original partitioning."""
    if not rules:
        return annotations
    pairs = ", ".join(
        f"'{old}', '{new}'" for old, new in sorted(rules.items())
    )
    remap = f"""
    map_from_entries(
      transform(
        array_distinct(
          transform(map_keys(entities),
                    k -> coalesce(element_at(map({pairs}), k), k))),
        new_key -> named_struct(
          'key', new_key,
          'value',
          aggregate(
            array_sort(
              flatten(
                transform(
                  filter(map_entries(entities),
                         e -> coalesce(element_at(map({pairs}), e.key), e.key) = new_key),
                  e -> e.value))),
            cast(array() as {_SPAN_ARR}),
            (acc, s) -> case
              when size(acc) = 0 then array(s)
              when s.start <= element_at(acc, -1).end
                then array_append(slice(acc, 1, size(acc) - 1),
                       named_struct('start', element_at(acc, -1).start,
                                    'end', greatest(element_at(acc, -1).end, s.end)))
              else array_append(acc, s)
            end)
        )
      )
    )
    """
    return annotations.withColumn("entities", F.expr(remap))


def reduce_labels(annotations: DataFrame, n_seeds: int = 10) -> tuple[DataFrame, dict]:
    """Full reduce_entities lifecycle; returns (rewritten, rules)."""
    rules = build_rules(label_frequencies(annotations), n_seeds)
    return apply_rules(annotations, rules), rules
