"""Distributed ↔ single-process conformance (the correctness gate).

1. byte-identical extracted text per url (BASELINE.json:15-16);
2. mention-set equality Spark vs kgref;
3. (subj, pred, obj) triple-set P/R ≥ 0.95 vs kgref (BASELINE.json:2) —
   in fact asserted exact, since the Spark stages import the same
   kernels / implement the same window semantics.
"""

import pytest

from ontonotes_5_parsing_spark import corpus
from ontonotes_5_parsing_spark.kgref import annotate_sentence, extract_text, split_sentences
from ontonotes_5_parsing_spark.kgref.ner import bio_to_spans
from ontonotes_5_parsing_spark.kgref.triples import extract_triples
from ontonotes_5_parsing_spark.pipeline import (
    extract_stage,
    mentions_stage,
    parse_stage,
    triples_stage,
)

N_PAGES = 120


@pytest.fixture(scope="module")
def pages(spark):
    return corpus.web_pages_df(spark, N_PAGES).cache()


@pytest.fixture(scope="module")
def stages(spark, pages):
    extracted = extract_stage(pages).cache()
    sentences = parse_stage(extracted).cache()
    mentions = mentions_stage(sentences)
    triples = triples_stage(sentences, mentions)
    return extracted, sentences, mentions, triples


def test_extract_byte_identity(stages):
    extracted, *_ = stages
    rows = extracted.select("url", "text").collect()
    assert len(rows) == N_PAGES
    for r in rows:
        doc_id = int(r["url"].rsplit("doc", 1)[1])
        page = corpus.generate_page(doc_id)
        assert r["text"] == extract_text(page["html"])
        assert r["text"] == page["text"]


def test_mentions_match_oracle(stages):
    _, sentences, mentions, _ = stages
    spark_mentions = {
        (r.url, r.sent_idx, r.start, r.end, r.surface, r.ent_type)
        for r in mentions.collect()
    }
    oracle_mentions = set()
    for r in sentences.select("url", "sent_idx", "text").collect():
        ann = annotate_sentence(r.text)
        for start, end, etype in bio_to_spans(ann["bio"], ann["bounds"]):
            oracle_mentions.add(
                (r.url, r.sent_idx, start, end, r.text[start:end], etype)
            )
    assert spark_mentions == oracle_mentions
    assert len(spark_mentions) > 0


def test_triples_pr_vs_oracle(stages):
    _, sentences, _, triples = stages
    spark_triples = {
        (r.url, r.sent_idx, r.subj, r.pred, r.obj) for r in triples.collect()
    }
    oracle_triples = set()
    for r in sentences.select("url", "sent_idx", "text").collect():
        for t in extract_triples(r.text):
            oracle_triples.add((r.url, r.sent_idx, t["subj"], t["pred"], t["obj"]))
    assert len(oracle_triples) > 0
    tp = len(spark_triples & oracle_triples)
    precision = tp / max(len(spark_triples), 1)
    recall = tp / max(len(oracle_triples), 1)
    assert precision >= 0.95, (precision, spark_triples - oracle_triples)
    assert recall >= 0.95, (recall, oracle_triples - spark_triples)
    # same-kernel construction ⇒ exact agreement expected
    assert spark_triples == oracle_triples


def test_sentence_parity(stages):
    extracted, sentences, *_ = stages
    per_url = {r.url: r.text for r in extracted.collect()}
    spark_sents = {
        (r.url, r.sent_idx, r.text) for r in sentences.select("url", "sent_idx", "text").collect()
    }
    oracle_sents = set()
    for url, text in per_url.items():
        for i, s in enumerate(split_sentences(text)):
            oracle_sents.add((url, i, s))
    assert spark_sents == oracle_sents


def test_window_and_fold_variants_agree(stages):
    """The shuffle-free fold implementations must equal the
    window-function formulations exactly."""
    from ontonotes_5_parsing_spark.pipeline.stages import (
        mentions_stage_window,
        triples_stage_window,
    )

    _, sentences, mentions, triples = stages
    win_mentions = {
        tuple(r) for r in mentions_stage_window(sentences).collect()
    }
    fold_mentions = {tuple(r) for r in mentions.collect()}
    assert win_mentions == fold_mentions

    win_triples = {
        (r.url, r.sent_idx, r.subj, r.pred, r.obj)
        for r in triples_stage_window(sentences, mentions).collect()
    }
    fold_triples = {
        (r.url, r.sent_idx, r.subj, r.pred, r.obj) for r in triples.collect()
    }
    assert win_triples == fold_triples


def test_hot_path_matches_relational_variants(spark, pages):
    """The fused extract+parse+annotate hot path must produce the same
    mentions and triples as the relational (fold) formulations."""
    from ontonotes_5_parsing_spark.pipeline.stages import (
        extract_parse_stage,
        mentions_from_parsed,
        mentions_stage,
        triples_from_parsed,
        triples_stage,
    )

    parsed = extract_parse_stage(pages).cache()
    hot_mentions = {tuple(r) for r in mentions_from_parsed(parsed).collect()}
    fold_mentions = {tuple(r) for r in mentions_stage(parsed).collect()}
    assert hot_mentions == fold_mentions
    hot_triples = {
        (r.url, r.sent_idx, r.subj, r.pred, r.obj)
        for r in triples_from_parsed(parsed).collect()
    }
    fold_triples = {
        (r.url, r.sent_idx, r.subj, r.pred, r.obj)
        for r in triples_stage(parsed, None).collect()
    }
    assert hot_triples == fold_triples and len(hot_triples) > 0


def test_coref_triples_match_oracle(spark, pages):
    """Coref-merged triples (hot path) must equal the kgref per-document
    sequential oracle (CorefState over sentences in order)."""
    from ontonotes_5_parsing_spark import corpus
    from ontonotes_5_parsing_spark.kgref import split_sentences, tokenize_any_text
    from ontonotes_5_parsing_spark.kgref.coref import CorefState, extract_triples_with_coref
    from ontonotes_5_parsing_spark.kgref.ner import tag_bio
    from ontonotes_5_parsing_spark.kgref.spans import get_token_bounds
    from ontonotes_5_parsing_spark.pipeline.stages import (
        extract_parse_stage,
        triples_from_parsed,
    )

    parsed = extract_parse_stage(pages, lean=True, coref=True)
    spark_triples = {
        (r.url, r.sent_idx, r.subj, r.pred, r.obj)
        for r in triples_from_parsed(parsed).collect()
    }
    oracle = set()
    n_pronoun_subjects = 0
    for r in pages.select("url").collect():
        doc_id = int(r.url.rsplit("doc", 1)[1])
        page = corpus.generate_page(doc_id)
        state = CorefState()
        for sent_idx, sent in enumerate(split_sentences(page["text"])):
            tokens = tokenize_any_text(sent)
            bounds = get_token_bounds(sent, tokens)
            bio = tag_bio(tokens)
            for t in extract_triples_with_coref(sent, tokens, bounds, bio, state):
                oracle.add((r.url, sent_idx, t["subj"], t["pred"], t["obj"]))
                if sent.startswith(("He ", "She ", "It ", "They ")):
                    n_pronoun_subjects += 1
    assert spark_triples == oracle
    assert n_pronoun_subjects > 0  # the corpus plants coref chains
