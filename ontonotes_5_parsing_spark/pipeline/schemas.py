"""Explicit StructTypes for every engine table (SURVEY.md §1.3).

Schemas are always declared, never inferred — the Spark mapping of the
reference's structural load-time validation
(/root/reference/ontonotes5/utils.py:1106-1257).
"""

from pyspark.sql import types as T

WEB_PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)

SPAN = T.StructType(
    [
        T.StructField("start", T.LongType(), False),
        T.StructField("end", T.LongType(), False),
    ]
)

# one row per sentence; token-level arrays kept columnar (struct-of-arrays)
SENTENCES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("sent_idx", T.IntegerType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("lang", T.StringType(), True),
        T.StructField("tokens", T.ArrayType(T.StringType()), False),
        T.StructField("starts", T.ArrayType(T.LongType()), False),
        T.StructField("ends", T.ArrayType(T.LongType()), False),
        T.StructField("bio", T.ArrayType(T.StringType()), False),
    ]
)

MENTIONS_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("sent_idx", T.IntegerType(), False),
        T.StructField("start", T.LongType(), False),
        T.StructField("end", T.LongType(), False),
        T.StructField("surface", T.StringType(), False),
        T.StructField("ent_type", T.StringType(), False),
    ]
)

TRIPLES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("sent_idx", T.IntegerType(), False),
        T.StructField("subj", T.StringType(), False),
        T.StructField("pred", T.StringType(), False),
        T.StructField("obj", T.StringType(), False),
        T.StructField("subj_type", T.StringType(), True),
        T.StructField("obj_type", T.StringType(), True),
        T.StructField("subj_span", SPAN, True),
        T.StructField("obj_span", SPAN, True),
    ]
)

NODES_SCHEMA = T.StructType(
    [
        T.StructField("entity_id", T.LongType(), False),
        T.StructField("canonical", T.StringType(), False),
        T.StructField("ent_type", T.StringType(), False),
        T.StructField("n_mentions", T.LongType(), False),
        T.StructField("n_surfaces", T.LongType(), False),
    ]
)

EDGES_SCHEMA = T.StructType(
    [
        T.StructField("src_entity_id", T.LongType(), False),
        T.StructField("pred", T.StringType(), False),
        T.StructField("dst_entity_id", T.LongType(), False),
        T.StructField("n_evidence", T.LongType(), False),
    ]
)

# the reference's annotated-sentence record (utils.py:732-737) as a table
ANNOTATIONS_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("sent_idx", T.IntegerType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("lang", T.StringType(), True),
        T.StructField("entities", T.MapType(T.StringType(), T.ArrayType(SPAN)), False),
    ]
)
