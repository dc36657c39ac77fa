"""Third-way semantics checks for the corpus-cleaning family
(operators/cleaning.py): pure-Python recomputation from the raw
parquet, independent of both the Spark and the DuckDB formulations.
"""

import hashlib

import pandas as pd

SF = "/root/testdata/sf0.001"


def _docs_pdf():
    return pd.read_parquet(f"{SF}/documents.parquet")


def _grams(toks, n):
    return [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]


def test_contamination_matches_python_recompute(spark):
    from ontonotes_5_parsing_spark.operators.cleaning import (
        BENCH_CUTOFF,
        NGRAM,
        q_contamination,
    )

    docs = _docs_pdf()
    bench = set()
    for _, row in docs[docs.doc_id < BENCH_CUTOFF].iterrows():
        toks = row["text"].split(" ")
        if len(toks) >= NGRAM:
            bench.update(_grams(toks, NGRAM))

    expected = {}
    for _, row in docs[docs.doc_id >= BENCH_CUTOFF].iterrows():
        toks = row["text"].split(" ")
        if len(toks) < NGRAM:
            continue
        gs = _grams(toks, NGRAM)
        hit = [g for g in gs if g in bench]
        if hit:
            expected[row["doc_id"]] = (len(gs), len(hit), len(set(hit)))

    got = {
        r.doc_id: (r.n_grams, r.contam_hits, r.contam_grams)
        for r in q_contamination(spark, SF).collect()
    }
    assert got == expected
    assert expected, "fixture must produce at least one contaminated doc"


def test_chunk_unique_matches_python_recompute(spark):
    from ontonotes_5_parsing_spark.operators.cleaning import CHUNK, q_chunk_unique

    docs = _docs_pdf().sort_values("doc_id")
    seen: set[str] = set()
    expected = {}
    # first-occurrence order = (doc_id, pos) ascending, exactly the
    # window's ORDER BY
    for _, row in docs.iterrows():
        toks = row["text"].split(" ")
        chunks = [
            " ".join(toks[j : j + CHUNK]) for j in range(0, len(toks), CHUNK)
        ]
        kept, n_dup = [], 0
        for c in chunks:
            if c in seen:
                n_dup += 1
            else:
                seen.add(c)
                kept.append(c)
        clean_md5 = hashlib.md5(" ".join(kept).encode()).hexdigest()
        expected[row["doc_id"]] = (len(chunks), n_dup, clean_md5)

    got = {
        r.doc_id: (r.n_chunks, r.n_dup_chunks, r.clean_md5)
        for r in q_chunk_unique(spark, SF).collect()
    }
    assert got == expected
    assert any(v[1] > 0 for v in expected.values()) or all(
        v[1] == 0 for v in expected.values()
    )


def test_chunk_unique_reconstruction_is_lossless_for_unique_docs(spark):
    """A doc with zero duplicate chunks must hash to exactly its own
    text (chunking + array_join round-trips the original string)."""
    from ontonotes_5_parsing_spark.operators.cleaning import q_chunk_unique

    docs = _docs_pdf().set_index("doc_id")
    for r in q_chunk_unique(spark, SF).collect():
        if r.n_dup_chunks == 0:
            text = docs.loc[r.doc_id, "text"]
            assert r.clean_md5 == hashlib.md5(text.encode()).hexdigest()
