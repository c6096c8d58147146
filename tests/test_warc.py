"""WARC sink + source (sources/warc.py) — record framing golden, gzip
member splitting, round-trip byte identity, record-type filtering, sink
dispatch. Cross-engine payload exactness is gated by q48."""

import glob
import gzip
import os

import pytest
from pyspark.sql import functions as F

from datascrapexter_spark.sources import warc
from datascrapexter_spark.sources.sinks import write_output


@pytest.fixture(scope="module")
def pages(spark):
    rows = [(f"https://w{i % 3}.example.org/p/{i}",
             f"<html><body>pagé {i} €</body></html>".encode())
            for i in range(57)]
    return spark.createDataFrame(rows, "url string, html binary").withColumn(
        "warc_ts", F.lit("2024-06-01 12:00:00").cast("timestamp"))


def test_record_framing_golden():
    rec = warc.build_record("https://example.org/a", None, b"hello")
    head, _, rest = rec.partition(b"\r\n\r\n")
    lines = head.decode().split("\r\n")
    assert lines[0] == "WARC/1.0"
    hdrs = dict(line.split(": ", 1) for line in lines[1:])
    assert hdrs["WARC-Type"] == "response"
    assert hdrs["WARC-Target-URI"] == "https://example.org/a"
    # content block = full HTTP response, record ends with CRLF CRLF
    assert rest.startswith(b"HTTP/1.1 200 OK\r\n")
    assert rest.endswith(b"hello\r\n\r\n")
    assert int(hdrs["Content-Length"]) == len(rest) - 4
    # deterministic record id: same url -> same id
    rec2 = warc.build_record("https://example.org/a", None, b"other")
    assert hdrs["WARC-Record-ID"] in rec2.decode("utf-8", "replace")


def test_roundtrip_gzip_members(spark, pages, tmp_path):
    out = str(tmp_path / "w")
    report = warc.write_warc(pages, out, num_files=4)
    files = sorted(glob.glob(os.path.join(out, "*.warc.gz")))
    assert files and sum(n for _, n in report) == 57
    # every file is a concatenation of standalone gzip members
    with open(files[0], "rb") as f:
        blob = f.read()
    members = list(warc._split_gzip_members(blob))
    assert len(members) > 1
    assert all(m.startswith(b"WARC/1.0\r\n") for m in members)
    got = {(r.url, bytes(r.html))
           for r in warc.read_warc(spark, out).collect()}
    want = {(r.url, bytes(r.html)) for r in pages.collect()}
    assert got == want


def test_roundtrip_uncompressed_and_ts(spark, pages, tmp_path):
    out = str(tmp_path / "plain")
    warc.write_warc(pages, out, num_files=2, compress=False)
    back = warc.read_warc(spark, out)
    row = back.filter(F.col("url").endswith("/p/7")).collect()[0]
    assert row.warc_ts.strftime("%Y-%m-%dT%H:%M:%S") == "2024-06-01T12:00:00"
    assert bytes(row.html) == "<html><body>pagé 7 €</body></html>".encode()


def test_record_type_filter(spark, tmp_path):
    # hand-build a stream with a warcinfo record before the response
    body = b"k: v\r\n"
    info = ("WARC/1.0\r\nWARC-Type: warcinfo\r\n"
            "Content-Type: application/warc-fields\r\n"
            f"Content-Length: {len(body)}\r\n\r\n").encode() + body + b"\r\n\r\n"
    resp = warc.build_record("https://x.org/1", None, b"body")
    p = tmp_path / "mix"
    p.mkdir()
    (p / "f.warc.gz").write_bytes(gzip.compress(info) + gzip.compress(resp))
    df = warc.read_warc(spark, str(p))
    rows = df.collect()
    assert [r.url for r in rows] == ["https://x.org/1"]
    both = warc.read_warc(spark, str(p),
                          record_types=("warcinfo", "response")).collect()
    assert sorted(r.warc_type for r in both) == ["response", "warcinfo"]


def test_sink_dispatch(spark, pages, tmp_path):
    out = str(tmp_path / "dispatch")
    write_output(pages, "warc.gz", out, options={"ts_col": "warc_ts"})
    assert warc.read_warc(spark, out).count() == 57


def test_empty_partitions_write_no_files(spark, tmp_path):
    empty = spark.createDataFrame([], "url string, html binary")
    out = str(tmp_path / "empty")
    report = warc.write_warc(empty, out, ts_col=None, num_files=4)
    assert report == []
    assert glob.glob(os.path.join(out, "*")) == []
