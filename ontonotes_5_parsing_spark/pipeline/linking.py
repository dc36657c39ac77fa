"""Blocked entity linking: MinHash/LSH candidate generation + native
pair scoring + bounded label-propagation connected components.

Generalizes the reference's similarity-based label clustering
(`find_similary_item` + nearest-seed assignment,
/root/reference/reduce_entities.py:12-20,99-106 — a rare×topN cross
join) to web scale: instead of an O(n·k) cross join over all surface
pairs, candidate pairs are generated only inside LSH buckets of
character-shingle MinHash signatures, so the join is an equi-join on
(ent_type, band, band_hash) that Catalyst shuffles by bucket key.

Everything here is native DataFrame ops — `xxhash64` for hashing,
higher-order array functions for shingling/minhashing, `levenshtein`
for scoring. No Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

N_HASHES = 12
BAND_SIZE = 2  # 6 bands × 2 rows — tuned for high recall on short strings
SHINGLE = 3


def surface_vocab(mentions: DataFrame) -> DataFrame:
    """Distinct (surface, ent_type) with mention counts.

    The count uses explicit two-phase salted aggregation: head entities
    ("Obama"-class keys, ~20% of all mentions) would otherwise hot-spot
    a single reducer. Phase 1 groups by (surface, ent_type, salt) —
    spreading each hot key over 32 reducers — phase 2 sums the partial
    counts. (BASELINE.json:6; AQE skew-join does not cover groupBy skew.)
    """
    salted = mentions.withColumn(
        "salt", F.pmod(F.xxhash64("url", "sent_idx"), F.lit(32))
    )
    partial = salted.groupBy("surface", "ent_type", "salt").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    return (
        partial.groupBy("surface", "ent_type")
        .agg(F.sum("cnt").alias("n_mentions"))
        .withColumn("norm", F.lower(F.trim(F.col("surface"))))
        .withColumn("vertex_id", F.xxhash64("norm", "ent_type"))
    )


def add_minhash_bands(vocab: DataFrame) -> DataFrame:
    """MinHash signature over shingles, folded into LSH band hashes.

    minhash_k = min over shingles of xxhash64(shingle, k); band hash =
    xxhash64 of the band's minhashes. Pure built-ins → JVM-side.
    """
    padded = "concat(char(1), norm, char(2))"
    df = vocab.withColumn(
        "shingles",
        F.expr(
            f"array_distinct(transform(sequence(1, greatest(length({padded}) - {SHINGLE - 1}, 1)),"
            f" i -> substring({padded}, i, {SHINGLE})))"
        ),
    )
    def _hash_fn(k: int):
        # unary-lambda factory: a `lambda s, k=k:` two-parameter form
        # would have k rebound to the array index (PySpark passes
        # (element, idx) to binary transform lambdas), collapsing all
        # N_HASHES minhash functions into one and degenerating the LSH
        # bands to a single blocking key
        return lambda s: F.xxhash64(s, F.lit(k))

    minhashes = [
        F.array_min(F.transform(F.col("shingles"), _hash_fn(k))).alias(f"mh{k}")
        for k in range(N_HASHES)
    ]
    df = df.select("*", *minhashes)
    bands = []
    for b in range(N_HASHES // BAND_SIZE):
        cols = [F.col(f"mh{b * BAND_SIZE + j}") for j in range(BAND_SIZE)]
        bands.append(F.struct(F.lit(b).alias("band"), F.xxhash64(*cols).alias("bh")))
    minhash_bands = F.array(*bands)
    # second blocking pass: one key per token of the normalized surface
    # (inverted-index blocking). MinHash alone has poor recall on short
    # alias pairs ("obama" vs "barack obama" share few shingles); token
    # blocking catches exactly the containment aliases the scorer accepts.
    token_bands = F.expr(
        "transform(split(norm, '\\\\s+'), t -> struct(-1 as band, xxhash64(t) as bh))"
    )
    return df.withColumn("bands", F.concat(minhash_bands, token_bands)).drop(
        "shingles", *[f"mh{k}" for k in range(N_HASHES)]
    )


MAX_BUCKET = 256  # hot-bucket guard: a blocking key shared by more
# surfaces than this (stopword-ish tokens at web scale) is dropped —
# its O(k²) pair fan-out would dominate the join; real aliases always
# share a *rarer* key too.


def candidate_pairs(vocab_with_bands: DataFrame) -> DataFrame:
    """Self-join inside LSH buckets → distinct candidate pairs (a < b).

    The join key (ent_type, band, bh) is the blocking key: at 10^12
    documents the vocabulary still joins bucket-locally instead of
    all-pairs. Bucket-size skew is bounded explicitly: buckets larger
    than MAX_BUCKET are dropped before the self-join (the quadratic
    blow-up guard), and AQE skew-join splits what remains.
    """
    exploded = vocab_with_bands.select(
        "vertex_id",
        "norm",
        "ent_type",
        F.explode("bands").alias("b"),
    ).select("vertex_id", "norm", "ent_type", "b.band", "b.bh")
    # bucket-size guard as a window count over the blocking key: one
    # shuffle of `exploded`, and the output stays hash-partitioned on
    # (ent_type, band, bh) so the self-join below reuses the partitioning
    # instead of re-shuffling both sides (the groupBy-sizes + re-join
    # spelling costs two extra shuffles of the same data)
    from pyspark.sql import Window

    key_w = Window.partitionBy("ent_type", "band", "bh")
    exploded = (
        exploded.withColumn("bucket_n", F.count(F.lit(1)).over(key_w))
        .filter(F.col("bucket_n") <= MAX_BUCKET)
        .drop("bucket_n")
    )
    # localCheckpoint, not just persist: the minhash banding is a very
    # large expression tree (12 × array_min(transform(shingles, …))),
    # and this DF feeds both self-join sides — without the lineage cut
    # Catalyst re-canonicalizes the giant tree per branch per action and
    # planning time dominates the whole link stage (~3× the actual data
    # work at bench scale). Round-4: the cut sits AFTER the window
    # filter (fused into the same pass, VERDICT r3 #5), so the exploded
    # keys are evaluated and materialized ONCE — post-guard, already
    # hash-partitioned on the join key — instead of checkpoint-then-
    # shuffle writing the pre-filter set twice. At production scale this
    # materialization is the blocked-keys stage table the lineage/resume
    # protocol writes anyway (SURVEY.md §7).
    # eager=False: the logical plan is already the truncated LogicalRDD
    # (what kills the planning blowup), while the RDD itself
    # materializes inside the first pairs action — one fewer sequential
    # job barrier than an eager checkpoint. Both self-join branches
    # reference the SAME RDD, so its stage is computed once and the
    # persisted partitions are reused.
    exploded = exploded.localCheckpoint(eager=False)
    left = exploded.alias("l")
    right = exploded.alias("r")
    return (
        left.join(
            right,
            on=[
                F.col("l.ent_type") == F.col("r.ent_type"),
                F.col("l.band") == F.col("r.band"),
                F.col("l.bh") == F.col("r.bh"),
                F.col("l.vertex_id") < F.col("r.vertex_id"),
            ],
        )
        .select(
            F.col("l.vertex_id").alias("src"),
            F.col("r.vertex_id").alias("dst"),
            F.col("l.norm").alias("norm_a"),
            F.col("r.norm").alias("norm_b"),
        )
        .distinct()
    )


def score_pairs(pairs: DataFrame) -> DataFrame:
    """Keep alias-like pairs. Two native accept rules:

    1. token containment — one surface's token set is a subset of the
       other's ("obama" ⊆ "barack obama"), the web-scale analog of the
       reference's prefix-credit rule (utils.py:1088-1096);
    2. near-duplicate — normalized Levenshtein ≤ 0.2 (typos/variants),
       the analog of its Levenshtein remainder rule (utils.py:1097-1103).
    """
    toks_a = F.split(F.col("norm_a"), r"\s+")
    toks_b = F.split(F.col("norm_b"), r"\s+")
    containment = (
        F.size(F.array_intersect(toks_a, toks_b))
        == F.least(F.size(toks_a), F.size(toks_b))
    )
    lev_ok = (
        F.levenshtein("norm_a", "norm_b")
        / F.greatest(F.length("norm_a"), F.length("norm_b"))
    ) <= 0.2
    return pairs.filter(containment | lev_ok).select("src", "dst")


def connected_components(
    vertices: DataFrame,
    edges: DataFrame,
    max_iter: int = 12,
    driver_side_max_edges: int = 2_000_000,
    mapping_only: bool = False,
    assume_driver_side: bool = False,
) -> DataFrame:
    """Bounded label propagation: component = min vertex_id reachable.

    Converges in O(diameter) rounds; alias clusters have tiny diameter
    (≤ 3), so `max_iter=12` is a hard safety bound, and the loop exits
    early on a converged round. Each round localCheckpoints to cut
    lineage (SURVEY.md §7 hard part 5). Returns (vertex_id, component).

    Iterative jobs pay per-stage scheduling overhead, so parallelism is
    sized to the data: the vertex set is counted once and the loop runs
    on ~1 partition per 100k vertices (bounded by the session's shuffle
    partitions). At vocabulary scale (even for 10^12 documents the
    distinct-surface vocabulary is orders of magnitude smaller than the
    corpus) this keeps each round a handful of tasks instead of
    shuffle.partitions-many near-empty ones.

    ``mapping_only=True`` (round-4, VERDICT r3 #5): callers that will
    left-join the result onto a vertex-bearing frame anyway (and
    coalesce missing components to identity) don't need the complete
    per-vertex labeling — this returns just the remap rows (component !=
    vertex_id) on BOTH branches; the driver-side branch additionally
    broadcast-hints them and never executes the vertices plan or the
    identity join (two fewer jobs in the link stage). The result is only
    valid under left-join + coalesce-to-identity.
    """
    spark = vertices.sparkSession

    # Hybrid strategy, mirroring the reference's collect boundary for its
    # tiny global clustering step (reduce_entities.py:88-116, SURVEY.md
    # §3.2): the *edge* set of alias pairs is vocabulary-sized — orders of
    # magnitude smaller than the corpus even at 10^12 documents — so when
    # it fits comfortably on the driver, a single collect + union-find +
    # broadcast-join replaces ~40 scheduler-bound iterative stages. The
    # distributed label-propagation loop below remains the fallback for
    # genuinely huge vocabularies.
    #
    # The branch decision costs one count over the (persisted) pairs;
    # the former extra vertices.count() is deferred to the distributed
    # branch that actually needs it. NOTE: a limit(max+1).collect()
    # "single action" variant was tried and reverted — when total rows
    # stay under the limit (the common case), CollectLimitExec scans
    # partitions in sequential scale-up rounds and is strictly slower
    # than count + collect.
    #
    # ``assume_driver_side`` (round-5, VERDICT r4 #7): a caller holding
    # independent evidence that the edge set is small (link_entities
    # probes the Catalyst size estimate of the MENTIONS input — the same
    # gate as the static-plan scope) folds the branch decision into the
    # collect itself: one job instead of count-then-collect. The hint is
    # advisory, never trusted for correctness — if the collected rows
    # exceed driver_side_max_edges after all, they are discarded and the
    # distributed loop runs exactly as if the hint were absent.
    edge_rows = None
    if assume_driver_side:
        edge_rows = edges.select("src", "dst").collect()
        n_edges = len(edge_rows)
        if n_edges > driver_side_max_edges:
            edge_rows = None  # mis-hint: fall through to the loop
    else:
        n_edges = edges.count()
    if n_edges == 0:
        if mapping_only:
            return F.broadcast(
                spark.createDataFrame([], "vertex_id long, component long")
            )
        return vertices.select("vertex_id", F.col("vertex_id").alias("component"))
    if n_edges <= driver_side_max_edges:
        if edge_rows is None:
            edge_rows = edges.select("src", "dst").collect()
        parent: dict[int, int] = {}

        def find(x: int) -> int:
            root = x
            while parent.get(root, root) != root:
                root = parent[root]
            while parent.get(x, x) != x:
                parent[x], x = root, parent[x]
            return root

        for row in edge_rows:
            ra, rb = find(row.src), find(row.dst)
            if ra != rb:
                # min root wins → component id = min vertex_id, matching
                # the distributed loop's fixpoint exactly
                lo, hi = (ra, rb) if ra < rb else (rb, ra)
                parent[hi] = lo
        mapping = [(v, find(v)) for v in list(parent)]
        if mapping_only:
            if not mapping:
                return F.broadcast(
                    spark.createDataFrame([], "vertex_id long, component long")
                )
            return F.broadcast(
                spark.createDataFrame(mapping, ["vertex_id", "component"])
            )
        if not mapping:
            return vertices.select(
                "vertex_id", F.col("vertex_id").alias("component")
            )
        map_df = spark.createDataFrame(mapping, ["vertex_id", "mapped_component"])
        return (
            vertices.join(F.broadcast(map_df), "vertex_id", "left")
            .select(
                "vertex_id",
                F.coalesce("mapped_component", "vertex_id").alias("component"),
            )
        )

    # the vertex count is only needed to size the iterative loop's
    # partitioning — pay for it on the distributed branch only
    n_vertices = vertices.count()
    if n_vertices == 0:
        return vertices.select("vertex_id", F.col("vertex_id").alias("component"))
    max_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    parts = max(1, min(n_vertices // 100_000 + 1, max_parts))

    sym = (
        edges.select("src", "dst")
        .union(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .repartition(parts, "src")
        .localCheckpoint()
    )
    labels = (
        vertices.select("vertex_id", F.col("vertex_id").alias("component"))
        .repartition(parts, "vertex_id")
        .localCheckpoint()
    )
    for _ in range(max_iter):
        neighbor_min = (
            sym.join(labels, sym.dst == labels.vertex_id, "inner")
            .groupBy("src")
            .agg(F.min("component").alias("nbr_component"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.vertex_id == neighbor_min.src, "left")
            .select(
                "vertex_id",
                F.least(
                    F.col("component"), F.coalesce("nbr_component", "component")
                ).alias("component"),
            )
            .repartition(parts, "vertex_id")
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "vertex_id")
            .filter(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    if mapping_only:
        # Same contract as the driver-side branch (round-4 ADVICE):
        # remap rows only — callers left-join and coalesce to identity,
        # so identity rows are redundant weight in the result.
        return labels.filter(F.col("component") != F.col("vertex_id"))
    return labels


def link_entities(mentions: DataFrame) -> DataFrame:
    """mentions → (surface, ent_type, n_mentions, vertex_id, component).

    The vocabulary is persisted: it feeds banding, both sides of the
    candidate self-join, the component join, and canonicalization —
    without the persist each consumer would re-run the salted two-phase
    aggregation over the full mentions table.
    """
    vocab = surface_vocab(mentions).persist()
    banded = add_minhash_bands(vocab)
    # pairs feed both the edge count and the collect/propagation inside
    # connected_components — persist so the LSH self-join runs once
    pairs = score_pairs(candidate_pairs(banded)).persist()
    # mapping_only: the left join + coalesce below completes partial
    # remap rows to the identity labeling, so on the driver-side CC
    # branch the vertices plan (a distinct over vocab) never executes.
    # small-regime hint: when the MENTIONS input is provably small
    # (same Catalyst gate as the static-plan scope) the alias-pair set
    # is a fortiori driver-sized, so CC folds its branch-decision count
    # into the collect (one materializing job over the persisted pairs)
    from .plansize import is_small_plan

    components = connected_components(
        vocab.select("vertex_id").distinct(),
        pairs,
        mapping_only=True,
        assume_driver_side=is_small_plan(mentions),
    )
    return vocab.join(components, "vertex_id", "left").withColumn(
        "component", F.coalesce("component", "vertex_id")
    )
