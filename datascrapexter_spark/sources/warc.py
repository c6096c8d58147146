"""WARC (ISO 28500) source + sink — the native Common Crawl page format.

The north rule targets "Common-Crawl-style web pages"; Common Crawl ships
them as WARC: a sequence of records, each a small \r\n-delimited header
block (WARC-Type, WARC-Target-URI, WARC-Date, Content-Length, ...) followed
by a captured HTTP response. The reference writes scraped results to
json/csv/db sinks (internal/output/manager.go dispatch) but has no archival
page format; this module adds the standard one so fetched pages can round-
trip between the engine's (url, warc_ts, html) tables and the format every
public web corpus uses.

Format notes (public spec, ISO 28500 / WARC 1.1; also iipc/warc-specs):
- record  = header block + CRLF + content block + CRLF CRLF
- .warc.gz = one gzip MEMBER per record, concatenated — this is what makes
  the file splittable-by-record for sequential scanners and is mandated by
  the Common Crawl layout.
- response records carry "Content-Type: application/http; msgtype=response"
  and the content block is the full HTTP response (status line + headers +
  body); the page payload is the HTTP body.

Spark-side design:
- writer: repartition to the requested file count, one .warc[.gz] file per
  partition written executor-side via mapInPandas (Arrow-batched; no
  driver collect); record ids are deterministic urn:uuid values derived
  from md5(url) so output is reproducible run-to-run.
- reader: `binaryFile` scan + mapInPandas record splitter. One WARC file =
  one task, which matches production reality: gzip members make records
  sequentially scannable but a .gz file is not block-splittable, so Common
  Crawl keeps files ~1 GiB and parallelism comes from file count (100 TB
  ≈ 100k files ≫ executor count). The blob never crosses an Exchange: the
  splitter emits final rows.

Round-trip exactness (payload bytes identical) is oracle-gated by q48.
"""

from __future__ import annotations

import base64
import gzip
import hashlib
import uuid
import zlib
from collections.abc import Iterator
from datetime import datetime, timezone

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

WARC_SCHEMA = ("url string, warc_ts timestamp, html binary, "
               "warc_type string, record_id string")
_WRITE_REPORT_SCHEMA = "file string, n_records long"


def _warc_date(ts) -> str:
    if ts is None or pd.isna(ts):
        ts = datetime(2000, 1, 1, tzinfo=timezone.utc)
    if getattr(ts, "tzinfo", None) is None:
        ts = pd.Timestamp(ts).tz_localize("UTC")
    return ts.strftime("%Y-%m-%dT%H:%M:%SZ")


def _record_id(url: str) -> str:
    # deterministic urn:uuid from the target URI (reproducible output;
    # real crawlers use random uuid4 — determinism is the better contract
    # for a resumable pipeline that may rewrite a partition)
    return f"<urn:uuid:{uuid.UUID(hashlib.md5(url.encode()).hexdigest())}>"


def build_record(url: str, ts, payload: bytes,
                 http_content_type: str = "text/html; charset=utf-8") -> bytes:
    """One WARC response record: WARC headers + captured HTTP response."""
    http = (b"HTTP/1.1 200 OK\r\n"
            + f"Content-Type: {http_content_type}\r\n".encode()
            + f"Content-Length: {len(payload)}\r\n\r\n".encode()
            + payload)
    b32 = base64.b32encode(hashlib.sha1(payload).digest()).decode()
    head = (
        "WARC/1.0\r\n"
        "WARC-Type: response\r\n"
        f"WARC-Record-ID: {_record_id(url)}\r\n"
        f"WARC-Date: {_warc_date(ts)}\r\n"
        f"WARC-Target-URI: {url}\r\n"
        f"WARC-Payload-Digest: sha1:{b32}\r\n"
        "Content-Type: application/http; msgtype=response\r\n"
        f"Content-Length: {len(http)}\r\n\r\n"
    ).encode()
    return head + http + b"\r\n\r\n"


def write_warc(df: DataFrame, path: str, url_col: str = "url",
               ts_col: str | None = "warc_ts",
               payload_col: str = "html",
               num_files: int | None = None,
               compress: bool = True) -> list[tuple[str, int]]:
    """Write (url, ts, payload) rows as .warc[.gz] files, one per partition,
    gzip-member-per-record. Executor-side file IO (local/NFS path contract,
    same as the xml/excel sinks); returns [(file, n_records), ...]."""
    import os

    from pyspark import TaskContext
    from pyspark.sql import functions as F

    os.makedirs(path, exist_ok=True)
    cols = [F.col(url_col).alias("url"),
            (F.col(ts_col) if ts_col else F.lit(None).cast("timestamp")
             ).alias("warc_ts"),
            F.col(payload_col).cast("binary").alias("html")]
    data = df.select(*cols)
    if num_files:
        data = data.repartition(num_files)
    ext = "warc.gz" if compress else "warc"

    def _write(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pid = TaskContext.get().partitionId()
        fname = os.path.join(path, f"part-{pid:05d}.{ext}")
        n = 0
        f = None   # opened lazily: empty partitions write no file
        try:
            for b in batches:
                for url, ts, payload in zip(b["url"], b["warc_ts"],
                                            b["html"]):
                    if f is None:
                        f = open(fname, "wb")
                    rec = build_record(url, ts, bytes(payload))
                    f.write(gzip.compress(rec, mtime=0) if compress else rec)
                    n += 1
        finally:
            if f is not None:
                f.close()
        if n:
            yield pd.DataFrame({"file": [fname], "n_records": [n]})

    report = data.mapInPandas(_write, _WRITE_REPORT_SCHEMA).collect()
    return [(r.file, r.n_records) for r in report]


def _split_gzip_members(blob: bytes) -> Iterator[bytes]:
    """Decompress a concatenation of gzip members one member at a time —
    the standard scan pattern for .warc.gz."""
    pos = 0
    while pos < len(blob):
        d = zlib.decompressobj(wbits=zlib.MAX_WBITS | 16)
        out = d.decompress(blob[pos:])
        yield out
        consumed = len(blob) - pos - len(d.unused_data)
        if consumed <= 0:   # corrupt trailing bytes: stop, don't spin
            return
        pos += consumed


def parse_warc(blob: bytes) -> Iterator[dict]:
    """Split one (decompressed) WARC stream into records. Yields dicts with
    url / warc_ts / html (HTTP body bytes) / warc_type / record_id."""
    pos = 0
    n = len(blob)
    while pos < n:
        # skip inter-record CRLFs
        while pos < n and blob[pos:pos + 2] == b"\r\n":
            pos += 2
        if pos >= n:
            return
        head_end = blob.find(b"\r\n\r\n", pos)
        if head_end < 0:
            return
        headers = {}
        lines = blob[pos:head_end].decode("utf-8", "replace").split("\r\n")
        if not lines or not lines[0].startswith("WARC/"):
            return
        for line in lines[1:]:
            k, _, v = line.partition(":")
            headers[k.strip().lower()] = v.strip()
        length = int(headers.get("content-length", "0"))
        content = blob[head_end + 4:head_end + 4 + length]
        pos = head_end + 4 + length
        wtype = headers.get("warc-type", "")
        payload = content
        if headers.get("content-type", "").startswith("application/http"):
            sep = content.find(b"\r\n\r\n")
            payload = content[sep + 4:] if sep >= 0 else content
        ts = headers.get("warc-date")
        yield {
            "url": headers.get("warc-target-uri"),
            "warc_ts": (pd.Timestamp(ts).tz_localize(None)
                        if ts else None),
            "html": payload,
            "warc_type": wtype,
            "record_id": headers.get("warc-record-id", ""),
        }


def read_warc(spark: SparkSession, path: str,
              record_types: tuple[str, ...] = ("response",)) -> DataFrame:
    """WARC source: binaryFile scan -> per-file Arrow-batched record split.
    Returns (url, warc_ts, html, warc_type, record_id); html is the HTTP
    response body, byte-identical to what write_warc was given."""
    files = (spark.read.format("binaryFile")
             .option("pathGlobFilter", "*.warc*")
             .load(path)
             .select("path", "content"))

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for p, blob in zip(b["path"], b["content"]):
                raw = bytes(blob)
                stream = (b"".join(_split_gzip_members(raw))
                          if p.endswith(".gz") else raw)
                for rec in parse_warc(stream):
                    if rec["warc_type"] in record_types:
                        rows.append(rec)
            if rows:
                yield pd.DataFrame(rows)

    return files.mapInPandas(_parse, WARC_SCHEMA)
