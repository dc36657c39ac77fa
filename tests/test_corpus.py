"""Corpus generator invariants (FIXTURES.md §1)."""

from ontonotes_5_parsing_spark.corpus import generate_page, generate_pages
from ontonotes_5_parsing_spark.kgref import extract_text, split_sentences
from ontonotes_5_parsing_spark.kgref.lexicon import HEAD_ENTITIES


def test_deterministic_and_order_independent():
    a = generate_page(7)
    b = generate_page(7)
    assert a == b
    df1 = generate_pages(range(10))
    df2 = generate_pages(reversed(range(10)))
    assert sorted(df1["url"]) == sorted(df2["url"])


def test_extract_roundtrip_byte_identity():
    # the per-row invariant, corpus-level (BASELINE.json:15)
    for d in range(300):
        page = generate_page(d)
        assert extract_text(page["html"]) == page["text"], page["url"]


def test_languages_and_structure():
    df = generate_pages(range(300))
    langs = set(df["lang"])
    assert langs == {"english", "arabic", "chinese"}
    assert df["url"].is_unique
    for text in df["text"]:
        assert len(split_sentences(text)) >= 3


def test_head_entity_skew_planted():
    df = generate_pages(range(500))
    en = "\n".join(df[df.lang == "english"]["text"])
    head_hits = sum(en.count(h) for h in HEAD_ENTITIES)
    assert head_hits > 100  # heads are strongly over-represented
