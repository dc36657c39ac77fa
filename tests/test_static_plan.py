"""Contracts for the round-4 graph-phase scheduling cuts.

1. ``_static_plan_if_small`` disables AQE only inside the scope, only
   when the probe input's Catalyst size estimate is under the
   threshold, and always restores the prior setting (even on error).
2. ``connected_components(mapping_only=True)`` returns only the remap
   rows on the driver-side branch, and the caller-side left join +
   coalesce reconstructs the exact complete labeling.
"""

import pytest
from pyspark.sql import functions as F

from ontonotes_5_parsing_spark.pipeline.linking import connected_components
from ontonotes_5_parsing_spark.pipeline.run import (
    _STATIC_PLAN_MAX_BYTES,
    _plan_size_bytes,
    _static_plan_if_small,
)


def test_static_plan_disables_and_restores_aqe(spark):
    df = spark.range(10)
    assert _plan_size_bytes(df) <= _STATIC_PLAN_MAX_BYTES
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    with _static_plan_if_small(spark, df):
        assert spark.conf.get("spark.sql.adaptive.enabled") == "false"
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"


def test_static_plan_restores_on_error(spark):
    df = spark.range(10)
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    with pytest.raises(RuntimeError):
        with _static_plan_if_small(spark, df):
            raise RuntimeError("boom")
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"


def test_static_plan_noop_when_probe_is_large(spark, monkeypatch):
    import ontonotes_5_parsing_spark.pipeline.run as run

    monkeypatch.setattr(run, "_plan_size_bytes", lambda _df: 1 << 62)
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    with run._static_plan_if_small(spark, spark.range(10)):
        assert spark.conf.get("spark.sql.adaptive.enabled") == "true"


def test_mapping_only_matches_complete_labeling(spark):
    # two components {1,2,3} and {4,5}; 6 is isolated
    vertices = spark.createDataFrame(
        [(i,) for i in range(1, 7)], ["vertex_id"]
    )
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (4, 5)], ["src", "dst"]
    )
    complete = {
        (r.vertex_id, r.component)
        for r in connected_components(vertices, edges).collect()
    }
    remap = connected_components(vertices, edges, mapping_only=True)
    # remap-only: no identity row for the isolated vertex 6
    remap_rows = {(r.vertex_id, r.component) for r in remap.collect()}
    assert (6, 6) not in remap_rows
    reconstructed = {
        (r.vertex_id, r.component)
        for r in vertices.join(remap, "vertex_id", "left")
        .withColumn("component", F.coalesce("component", "vertex_id"))
        .collect()
    }
    assert reconstructed == complete == {
        (1, 1), (2, 1), (3, 1), (4, 4), (5, 4), (6, 6)
    }


def test_mapping_only_no_edges(spark):
    vertices = spark.createDataFrame([(1,), (2,)], ["vertex_id"])
    edges = spark.createDataFrame([], "src long, dst long")
    remap = connected_components(vertices, edges, mapping_only=True)
    assert remap.count() == 0
    assert remap.columns == ["vertex_id", "component"]
