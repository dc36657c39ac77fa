"""Independent recomputation checks for the LLM-ingest quality family.

The DuckDB oracles (tools/check_oracle.py) verify cross-engine SQL
agreement; these tests verify the *semantics* a third way — a pandas/
pure-Python recomputation from the raw parquet — so a bug shared by
both SQL formulations would still be caught. Also structural checks for
dedup_components (cluster consistency against the pair list).
"""

import hashlib
import math
from collections import Counter

import pandas as pd


def _round_half_up(x: float, digits: int) -> float:
    """Spark's and DuckDB's round() on positive doubles (HALF_UP) —
    Python's builtin round is half-even and genuinely diverges on
    binary-exact ties like 137/32 = 4.28125."""
    scale = 10 ** digits
    return math.floor(x * scale + 0.5) / scale

SF = "/root/testdata/sf0.001"


def _docs_pdf():
    return pd.read_parquet(f"{SF}/documents.parquet")


def test_quality_filter_matches_python_recompute(spark):
    from ontonotes_5_parsing_spark.operators.quality import (
        MIN_MEAN_WLEN,
        MIN_STOP_HITS,
        MIN_WORDS,
        q_quality_filter,
    )
    from ontonotes_5_parsing_spark.operators.text import STOPWORDS

    got = {r.doc_id: r for r in q_quality_filter(spark, SF).collect()}
    stop = set(STOPWORDS)
    for _, row in _docs_pdf().iterrows():
        toks = row["text"].split(" ")
        n = len(toks)
        mean_wlen = _round_half_up(sum(len(t) for t in toks) / n, 4)
        hits = sum(1 for t in toks if t in stop)
        r = got[row["doc_id"]]
        assert r.n_words == n
        assert abs(r.mean_word_len - mean_wlen) < 1e-9
        assert r.stopword_hits == hits
        assert r.keep == (
            MIN_WORDS <= n <= 100_000
            and MIN_MEAN_WLEN <= mean_wlen <= 10.0
            and hits >= MIN_STOP_HITS
        )


def test_repetition_matches_python_recompute(spark):
    from ontonotes_5_parsing_spark.operators.quality import q_repetition

    got = {r.doc_id: r for r in q_repetition(spark, SF).collect()}
    for _, row in _docs_pdf().iterrows():
        toks = row["text"].split(" ")
        if len(toks) < 2:
            assert row["doc_id"] not in got
            continue
        bigrams = Counter(
            f"{toks[i]} {toks[i+1]}" for i in range(len(toks) - 1)
        )
        r = got[row["doc_id"]]
        assert r.n_bigrams == len(toks) - 1
        assert r.top_bigram_count == max(bigrams.values())


def test_hash_sample_matches_python_recompute(spark):
    from ontonotes_5_parsing_spark.operators.quality import (
        SAMPLE_PCT,
        q_hash_sample,
    )

    pdf = _docs_pdf()
    keep = pdf[
        pdf["doc_id"].map(
            lambda d: int(hashlib.md5(str(d).encode()).hexdigest()[:15], 16) % 100
            < SAMPLE_PCT
        )
    ]
    expected = (
        keep.groupby("lang")
        .agg(n=("doc_id", "size"), chars=("n_chars", "sum"))
        .to_dict("index")
    )
    got = {r.lang: r for r in q_hash_sample(spark, SF).collect()}
    assert set(got) == set(expected)
    for lang, e in expected.items():
        assert got[lang].n_sampled == e["n"]
        assert got[lang].sampled_chars == e["chars"]


def test_dedup_components_consistent_with_pairs(spark):
    """Structure check: every near-dup pair's endpoints share a
    component; the keeper is the component's min doc_id; component
    sizes sum to the number of distinct endpoint docs."""
    from ontonotes_5_parsing_spark.operators.dedup import (
        q_dedup_components,
        q_jaccard_pairs,
    )

    pairs = [(r.doc_a, r.doc_b) for r in q_jaccard_pairs(spark, SF).collect()]
    comps = q_dedup_components(spark, SF).collect()
    assert pairs and comps

    # union-find recompute
    parent: dict = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = sorted((ra, rb))
            parent[hi] = lo
    members: dict = {}
    docs = {d for p in pairs for d in p}
    for d in docs:
        members.setdefault(find(d), set()).add(d)

    got = {r.component: r for r in comps}
    assert set(got) == set(members)
    for comp, mem in members.items():
        assert got[comp].n_members == len(mem)
        assert got[comp].keeper_doc_id == min(mem) == comp
    assert sum(r.n_members for r in comps) == len(docs)
