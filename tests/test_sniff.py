"""Content/charset sniffing on handcrafted binary fixtures.

Covers the magic-byte paths the synthetic q51 corpus does not exercise
(RIFF/WAVE, mp4 ftyp, UTF-16BE, octet-stream fallback, unquoted meta
charset, html without doctype) plus plan shape: the whole sniff must be
a single Project over the source — no exchange, no Python node.
"""
from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from datascrapexter_spark.functions.sniff import sniff_cols

CASES = [
    # (payload, mime, charset, has_bom, is_text)
    (b"\x89PNG\r\n\x1a\nrest", "image/png", None, False, False),
    (b"GIF87a;;;", "image/gif", None, False, False),
    (b"GIF89a;;;", "image/gif", None, False, False),
    (b"\xff\xd8\xff\xdbJFIF", "image/jpeg", None, False, False),
    (b"%PDF-1.4\n%binary", "application/pdf", None, False, False),
    (b"PK\x03\x04contents", "application/zip", None, False, False),
    (b"\x1f\x8b\x08\x00gz", "application/gzip", None, False, False),
    (b"OggSvorbis", "audio/ogg", None, False, False),
    (b"RIFF\x24\x00\x00\x00WAVEfmt ", "audio/wav", None, False, False),
    # RIFF without WAVE at offset 8 is not wav; bytes are non-ascii-clean
    (b"RIFF\x24\x00\x00\x00AVI LIST", "application/octet-stream",
     None, False, False),
    (b"\x00\x00\x00\x18ftypmp42", "video/mp4", None, False, False),
    (b"<?xml version=\"1.0\" encoding=\"ISO-8859-1\"?><r/>",
     "application/xml", "iso-8859-1", False, True),
    (b"  <!DOCTYPE HTML><html></html>", "text/html", "us-ascii",
     False, True),
    (b"<HTML><head><meta charset=utf-8></head>", "text/html", "utf-8",
     False, True),
    (b"<html><meta charset='Windows-1252'>", "text/html", "windows-1252",
     False, True),
    # BOM then html: mime still html, charset from BOM-stripped meta scan
    (b"\xef\xbb\xbf<html><meta charset=\"UTF-8\">", "text/html", "utf-8",
     True, True),
    (b'{"k": [1, 2]}', "application/json", "us-ascii", False, True),
    (b"  [1, 2, 3]", "application/json", "us-ascii", False, True),
    (b"\xef\xbb\xbfplain bom text", "text/plain", "utf-8", True, True),
    (b"\xff\xfeh\x00i\x00", "text/plain", "utf-16le", True, True),
    (b"\xfe\xff\x00h\x00i", "text/plain", "utf-16be", True, True),
    (b"just words\nand lines\r\n", "text/plain", "us-ascii", False, True),
    (b"\x00\x01\x02\x03random", "application/octet-stream", None,
     False, False),
    (b"", "text/plain", "us-ascii", False, True),
]


@pytest.fixture(scope="module")
def sniffed(spark):
    df = spark.createDataFrame(
        [Row(i=i, payload=c[0]) for i, c in enumerate(CASES)],
        "i int, payload binary")
    cols = sniff_cols(F.col("payload"))
    out = df.select("i", *[v.alias(k) for k, v in cols.items()])
    return {r["i"]: r for r in out.collect()}


@pytest.mark.parametrize("idx", range(len(CASES)))
def test_sniff_case(sniffed, idx):
    _, mime, charset, has_bom, is_text = CASES[idx]
    row = sniffed[idx]
    assert row["mime"] == mime
    assert row["charset"] == charset
    assert row["has_bom"] == has_bom
    assert row["is_text"] == is_text


def test_sniff_is_single_project(spark):
    df = spark.createDataFrame([Row(payload=b"x")], "payload binary")
    cols = sniff_cols(F.col("payload"))
    plan = df.select(*[v.alias(k) for k, v in cols.items()])._jdf \
        .queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Python" not in plan and "BatchEval" not in plan
