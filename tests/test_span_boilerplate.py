"""Within-host boilerplate line removal + repeated-span dedup.

Hand-built fixtures assert the exact keep/strip semantics; the sf-scale
correctness is oracle-gated (q68/q69 in tools/check_queries.py).
"""

import pytest
from pyspark.sql import functions as F

from datascrapexter_spark.ops import dedup


def _rows(df, *cols):
    return {tuple(r) for r in df.select(*cols).collect()}


# ---------------------------------------------------------------------------
# host_boilerplate_lines / host_boilerplate_strip
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def host_docs(spark):
    rows = []
    for d in range(6):
        lines = [f"unique line {d} one", f"unique line {d} two"]
        if d != 0:
            lines.append("shared footer line")   # 5/6 docs -> boilerplate
        if d % 3 == 0:
            lines.append("rare promo line")      # 2/6 docs -> kept
        rows.append((d, "hostA", lines))
    # hostB has the same footer text but only 1/2 docs -> kept there
    rows.append((100, "hostB", ["solo line", "shared footer line"]))
    rows.append((101, "hostB", ["other line"]))
    return spark.createDataFrame(
        rows, "doc_id long, host string, lines array<string>")


def test_boilerplate_lines_threshold(spark, host_docs):
    out = dedup.host_boilerplate_lines(host_docs, min_docs=3, min_frac=0.5)
    rows = out.collect()
    # exactly one boilerplate line, on hostA only
    assert len(rows) == 1
    r = rows[0]
    assert r["host"] == "hostA"
    assert r["n_docs_with"] == 5 and r["n_docs_host"] == 6


def test_boilerplate_strip_is_per_host(spark, host_docs):
    out = dedup.host_boilerplate_strip(host_docs, min_docs=3, min_frac=0.5)
    by_id = {r["doc_id"]: r for r in out.collect()}
    # hostA docs lose the footer; below-threshold promo line survives
    assert by_id[3]["text"] == (
        "unique line 3 one\nunique line 3 two\nrare promo line")
    assert by_id[1]["text"] == "unique line 1 one\nunique line 1 two"
    assert by_id[1]["n_lines"] == 3 and by_id[1]["n_kept"] == 2
    # hostB keeps the identical footer text (its own frequency is 1/2)
    assert by_id[100]["text"] == "solo line\nshared footer line"


def test_boilerplate_strip_order_preserved(spark):
    # boilerplate line sits in the MIDDLE; survivors keep original order
    rows = [(i, "h", [f"a{i}", "mid boiler", f"z{i}"]) for i in range(4)]
    df = spark.createDataFrame(
        rows, "doc_id long, host string, lines array<string>")
    out = dedup.host_boilerplate_strip(df, min_docs=3, min_frac=0.5)
    assert {r["text"] for r in out.collect()} == {
        f"a{i}\nz{i}" for i in range(4)}


def test_boilerplate_all_lines_boiler_drops_doc(spark):
    rows = [(i, "h", ["same line"]) for i in range(5)]
    df = spark.createDataFrame(
        rows, "doc_id long, host string, lines array<string>")
    out = dedup.host_boilerplate_strip(df, min_docs=3, min_frac=0.5)
    assert out.count() == 0


# ---------------------------------------------------------------------------
# repeated_span_dedup
# ---------------------------------------------------------------------------


def test_span_dedup_keep_first_and_coverage(spark):
    rows = [
        (1, "a b c d e f g h i j"),        # winner: untouched
        (2, "x y a b c d e f g h i j z"),  # loses the copied 10-token run
        (3, "p q r"),                      # shorter than k: untouched
        (4, "a b c d e f g h i j"),        # exact dup: fully covered
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r
           for r in dedup.repeated_span_dedup(df, k=5).collect()}
    assert out[1]["text"] == "a b c d e f g h i j"
    assert out[1]["n_tokens"] == 10 and out[1]["n_kept"] == 10
    # overlapping duplicated 5-windows merge into one removed run
    assert out[2]["text"] == "x y z"
    assert out[2]["n_kept"] == 3
    assert out[3]["text"] == "p q r"
    # full coverage keeps the row with empty text (spans removed, doc kept)
    assert out[4]["n_kept"] == 0 and out[4]["text"] == ""


def test_span_dedup_winner_is_global_min_id_pos(spark):
    # the span appears twice in doc 7 itself: first occurrence wins,
    # the later intra-doc copy is removed too
    rows = [(7, "a b c d e q q a b c d e")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = dedup.repeated_span_dedup(df, k=5).collect()[0]
    assert out["text"] == "a b c d e q q"
    assert out["n_tokens"] == 12 and out["n_kept"] == 7


def test_span_dedup_no_duplicates_is_identity(spark):
    rows = [(i, " ".join(f"t{i}w{j}" for j in range(8))) for i in range(6)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = dedup.repeated_span_dedup(df, k=5)
    got = _rows(out, "doc_id", "text")
    assert got == {(i, " ".join(f"t{i}w{j}" for j in range(8)))
                   for i in range(6)}
