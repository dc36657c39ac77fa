"""Entity gazetteer + predicate lexicon shared by the reference
extractor (kgref) and the synthetic corpus generator (corpus.py).

The gazetteer covers the OntoNotes 18 entity types
(/root/reference/readme.md's annotation scheme; types enumerated in the
corpus's `name:` Leaves lines, cf. /root/reference/ontonotes5/utils.py:117)
with deterministic surface forms in the reference's three languages
(english / arabic / chinese — /root/reference/readme.md:8). Head-entity
skew is built in: `HEAD_ENTITIES` are over-sampled by the corpus
generator to exercise salted aggregation (BASELINE.json:6).
"""

from __future__ import annotations

ONTONOTES_TYPES = [
    "PERSON", "NORP", "FAC", "ORG", "GPE", "LOC", "PRODUCT", "EVENT",
    "WORK_OF_ART", "LAW", "LANGUAGE", "DATE", "TIME", "PERCENT", "MONEY",
    "QUANTITY", "ORDINAL", "CARDINAL",
]

# surface form -> entity type.  Multi-token surfaces exercise B-/I- BIO
# tagging; aliases of the same real-world entity (e.g. "Obama" /
# "Barack Obama") exercise entity linking.
GAZETTEER: dict[str, str] = {
    # PERSON (aliases grouped)
    "Barack Obama": "PERSON", "Obama": "PERSON", "President Obama": "PERSON",
    "Marie Curie": "PERSON", "Curie": "PERSON",
    "Albert Einstein": "PERSON", "Einstein": "PERSON",
    "Ada Lovelace": "PERSON", "Lovelace": "PERSON",
    "Alan Turing": "PERSON", "Turing": "PERSON",
    "Grace Hopper": "PERSON", "Hopper": "PERSON",
    "Isaac Newton": "PERSON", "Newton": "PERSON",
    "孔子": "PERSON", "李白": "PERSON",
    "ابن سينا": "PERSON", "الخوارزمي": "PERSON",
    # GPE
    "France": "GPE", "Paris": "GPE", "Germany": "GPE", "Berlin": "GPE",
    "Japan": "GPE", "Tokyo": "GPE", "Brazil": "GPE", "Egypt": "GPE",
    "Cairo": "GPE", "United States": "GPE", "America": "GPE",
    "北京": "GPE", "上海": "GPE", "القاهرة": "GPE", "مصر": "GPE",
    # ORG
    "United Nations": "ORG", "Acme Corp": "ORG", "Acme": "ORG",
    "Globex": "ORG", "Initech": "ORG", "Stark Industries": "ORG",
    "Wayne Enterprises": "ORG", "Umbrella Corp": "ORG",
    "清华大学": "ORG", "جامعة الأزهر": "ORG",
    # NORP / LANGUAGE / LOC / FAC / PRODUCT / EVENT / WORK_OF_ART / LAW
    "French": "NORP", "German": "NORP", "Japanese": "NORP",
    "English": "LANGUAGE", "Arabic": "LANGUAGE", "Chinese": "LANGUAGE",
    "Mount Fuji": "LOC", "the Nile": "LOC", "Sahara": "LOC",
    "Eiffel Tower": "FAC", "Golden Gate Bridge": "FAC",
    "iPhone": "PRODUCT", "Falcon 9": "PRODUCT",
    "World Cup": "EVENT", "Olympics": "EVENT",
    "Mona Lisa": "WORK_OF_ART", "Hamlet": "WORK_OF_ART",
    "Magna Carta": "LAW",
    # DATE / TIME
    "January": "DATE", "March 2020": "DATE", "1969": "DATE", "2024": "DATE",
    "Monday": "DATE", "noon": "TIME", "midnight": "TIME",
    # numeric-ish
    "first": "ORDINAL", "second": "ORDINAL", "third": "ORDINAL",
    "dozens": "CARDINAL", "hundreds": "CARDINAL", "thousands": "CARDINAL",
}

# canonical-entity alias groups (ground truth for linking tests)
ALIAS_GROUPS: list[list[str]] = [
    ["Barack Obama", "Obama", "President Obama"],
    ["Marie Curie", "Curie"],
    ["Albert Einstein", "Einstein"],
    ["Ada Lovelace", "Lovelace"],
    ["Alan Turing", "Turing"],
    ["Grace Hopper", "Hopper"],
    ["Isaac Newton", "Newton"],
    ["Acme Corp", "Acme"],
]

# over-sampled head entities (~20% of mentions) — skew driver
HEAD_ENTITIES = ["Obama", "France", "United Nations", "Einstein", "Paris"]

# single-token predicate verbs for (subj, pred, obj) pattern extraction
PREDICATE_VERBS = [
    "founded", "visited", "acquired", "met", "leads", "owns", "joined",
    "praised", "criticized", "advised",
]

# filler vocabulary for non-fact sentences (never entity surfaces)
FILLER_WORDS = [
    "the", "a", "quick", "report", "shows", "that", "market", "values",
    "rose", "slightly", "while", "analysts", "expected", "steady",
    "growth", "during", "this", "quarter", "despite", "ongoing",
    "concerns", "about", "supply", "and", "demand", "levels",
]

CJK_FILLER = ["我们", "今天", "学习", "数据", "系统", "非常", "重要"]
ARABIC_FILLER = ["هذا", "تقرير", "جديد", "حول", "البيانات", "الكبيرة"]
