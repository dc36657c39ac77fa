"""DuckDB-oracle agreement for the newest operator family members
(language-ID, embedding-cosine near-dup, IVF ANN) at sf0.001 — the
same row-count + column-name + order-insensitive value-hash compare
the driver applies (see tools/check_oracle.py for the full gate).
"""

import hashlib

import duckdb
import pytest

from ontonotes_5_parsing_spark.operators.registry import ALL_QUERIES

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]
NEW_QUERIES = [
    "txt_langid",
    "dedup_embedding_cosine",
    "ann_ivf_topk",
    "evt_asof_join",
    "evt_range_join",
    "rel_small_quantity_revenue",
    "dedup_minhash_md5_buckets",
    "rel_order_cube",
    "dedup_simhash_md5",
    # round-2 LLM-ingest quality family + events additions
    "txt_quality_filter",
    "txt_repetition",
    "txt_ngram_topk",
    "txt_tfidf_top_terms",
    "txt_bpe_tokens",
    "evt_json_props",
    "evt_daily_retention",
    "dedup_components",
    "rel_quantity_percentiles",
    "win_customer_spend_rank",
    "rel_nation_balance_full_outer",
    "txt_hash_sample",
    "evt_funnel",
    "rel_market_share",
    "win_events_trailing_hour",
    "rel_stats_moments",
]


def _norm_hash(rows, columns):
    order = sorted(range(len(columns)), key=lambda i: columns[i])

    def fmt(v):
        if v is None:
            return "NULL"
        if isinstance(v, float):
            return f"{v:.6f}".rstrip("0").rstrip(".")
        return str(v)

    lines = sorted(",".join(fmt(row[i]) for i in order) for row in rows)
    return hashlib.md5("\n".join(lines).encode()).hexdigest()


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return c


@pytest.mark.parametrize("name", NEW_QUERIES)
def test_matches_duckdb_oracle(spark, con, name):
    fn, sql = ALL_QUERIES[name]
    assert sql is not None
    sdf = fn(spark, SF_DIR)
    srows = [tuple(r) for r in sdf.collect()]
    scols = sdf.columns
    dres = con.execute(sql)
    dcols = [d[0] for d in dres.description]
    drows = dres.fetchall()
    assert len(srows) > 0, "query must be non-empty at sf0.001"
    assert sorted(scols) == sorted(dcols)
    assert len(srows) == len(drows)
    assert _norm_hash(srows, scols) == _norm_hash(drows, dcols)
