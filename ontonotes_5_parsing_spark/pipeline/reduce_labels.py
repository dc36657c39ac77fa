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


_LABEL_SPLIT_RE = r"[.+:\-=]"


def _distance_exprs(df: DataFrame, a: str, b: str) -> DataFrame:
    """Attach `dist` = label_distance(`a`, `b`) computed entirely with
    built-in Column expressions — the relational twin of
    kgref.distance.label_distance (same branch order, same values;
    elementwise agreement asserted in tests/test_reduce_labels.py).
    `a`/`b` keep the reference's (candidate, label) argument order."""
    parts = (
        lambda c: F.filter(
            F.transform(F.split(F.col(c), _LABEL_SPLIT_RE), lambda x: F.trim(x)),
            lambda x: x != "",
        )
    )
    df = (
        df.withColumn("_p1", parts(a))
        .withColumn("_p2", parts(b))
        .withColumn("_s1", F.array_join("_p1", "-"))
        .withColumn("_s2", F.array_join("_p2", "-"))
        .withColumn(
            "_shared",
            F.expr(
                "aggregate(sequence(1, least(size(_p1), size(_p2))), 0, "
                "(acc, i) -> acc + IF(slice(_p1, 1, i) = slice(_p2, 1, i), 1, 0))"
            ),
        )
        .withColumn(
            "_rest1",
            F.expr("array_join(slice(_p1, _shared + 1, size(_p1) - _shared), '-')"),
        )
        .withColumn(
            "_rest2",
            F.expr("array_join(slice(_p2, _shared + 1, size(_p2) - _shared), '-')"),
        )
    )
    la, lb = F.col(a), F.col(b)
    dist = (
        F.when(F.trim(la) == F.trim(lb), F.lit(0))
        .when(
            la.rlike(r"\w") != lb.rlike(r"\w"),
            (F.length(la) + F.length(lb)) * 10,
        )
        .when((F.size("_p1") == 0) & (F.size("_p2") == 0), F.lit(0))
        .when(F.size("_p1") == 0, F.length("_s2") + 2)
        .when(F.size("_p2") == 0, F.length("_s1") + 2)
        .when(F.col("_s1") == F.col("_s2"), F.lit(1))
        .when(
            F.col("_s1").startswith(F.col("_s2"))
            | F.col("_s2").startswith(F.col("_s1")),
            F.lit(2),
        )
        .when(
            F.col("_shared") > 0,
            F.levenshtein("_rest1", "_rest2") + 2,
        )
        .otherwise(F.levenshtein("_s1", "_s2") * 10 + 2)
    )
    return df.withColumn("dist", dist).drop(
        "_p1", "_p2", "_s1", "_s2", "_shared", "_rest1", "_rest2"
    )


def build_rules_df(freq: DataFrame, n_seeds: int = 10) -> DataFrame:
    """Relational build_rules: (label, canonical) rules as a DataFrame —
    every step is a DataFrame op, no driver-side collect, so the rules
    job scales with the label vocabulary even if an annotation scheme
    ever stops being tiny. Semantics are byte-identical to build_rules
    (tie-breaks included: nearest seed = min (dist, seed_rank), the
    reference's first-wins loop; canonical = min (len, label) over the
    cluster).
    """
    from pyspark.sql import Window

    w_seed = Window.orderBy(F.desc("freq"), "label")
    ranked = freq.withColumn("rank", F.row_number().over(w_seed))
    seeds = ranked.filter(F.col("rank") <= n_seeds).select(
        F.col("label").alias("seed"), F.col("rank").alias("seed_rank")
    )
    members = ranked.filter(F.col("rank") > n_seeds).select("label")
    scored = _distance_exprs(
        members.crossJoin(F.broadcast(seeds)), "seed", "label"
    )
    w_near = Window.partitionBy("label").orderBy("dist", "seed_rank")
    assigned = (
        scored.withColumn("rn", F.row_number().over(w_near))
        .filter(F.col("rn") == 1)
        .select("seed", "label")
    )
    clustered = assigned.unionByName(
        seeds.select("seed", F.col("seed").alias("label"))
    )
    canon = clustered.groupBy("seed").agg(
        F.min_by(
            "label", F.struct(F.length("label").alias("len"), F.col("label"))
        ).alias("canonical")
    )
    return (
        clustered.join(canon, "seed")
        .select("label", "canonical")
    )


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
