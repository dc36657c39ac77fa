"""operators — the relational operator surface (SURVEY.md §2) as named
queries over the driver test tables, each paired with a DuckDB oracle.

Every entry maps 1:1 into `__spark_entry__.queries()` /
`oracle_sql()`; names group by reference operator family:

- ``rel_*``    scans/filters/joins/aggs/sorts/set-ops (§2.1–2.7)
- ``win_*``    window/sequential ops (§2.5)
- ``txt_*``    text analysis over `documents` (token counting, quality,
               fingerprinting — F-ops §2.8 generalized to webtext)
- ``dedup_*``  deduplication family (exact, n-gram Jaccard, MinHash,
               SimHash)
- ``ann_*``    similarity search over `embeddings`
- ``kg_*``     the KG pipeline itself surfaced as queries (rows-only
               checks where SQL can't express the semantics)
"""

from .registry import ALL_QUERIES  # noqa: F401
