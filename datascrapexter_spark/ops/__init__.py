"""Training-data-pipeline operators on top of the crawl engine's output.

These are the operations a 100 TB web-text corpus pipeline needs after the
crawl (SURVEY.md §2 "beyond the reference"): dedup families, similarity
search, text analysis, multimodal column plumbing. Everything is declared
through native Column expressions where possible (whole-stage codegen);
Python appears only in Arrow-batched UDFs for genuinely non-SQL work.

Hash discipline: operators that need content hashing use md5 (JVM built-in,
also available in every SQL engine) so results are verifiable against an
independent SQL oracle; frontier identity hashing stays xxhash64 per the
north rule.
"""

from . import (  # noqa: F401
    bpe,
    dedup,
    drift,
    enrich,
    graphrank,
    mix,
    multimodal,
    pii,
    pipeline,
    retrieval,
    sampling,
    similarity,
    sketches,
    textstats,
)
