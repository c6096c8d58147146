"""Content-type + charset sniffing over binary payloads, pure codegen.

A crawl at 100 TB cannot trust Content-Type headers: servers lie, CDNs
strip charsets, and binary assets arrive labelled text/html.  This module
sniffs MIME type from magic bytes and character encoding from BOM /
``<meta charset>`` / ``<?xml encoding?>`` declarations — entirely with
built-in Spark expressions over a bounded prefix of the payload, so the
whole classifier is one codegen ``Project`` per row: no Python, no UDF,
no shuffle.

The reference engine consumes server-declared types only
(DataScrapexter fetches via net/http and never inspects payload bytes);
byte-level sniffing is a crawl-tier addition this engine needs because
WARC-scale corpora (q48) carry no trustworthy headers at all.

Only the first ``HEAD_LEN`` bytes are examined, so the expression cost
is independent of payload size and the payload column itself is never
widened or shuffled.
"""
from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Bytes examined for text-vs-binary and declared-charset detection.
HEAD_LEN = 1024

# (signature bytes, mime) probed in order; first hit wins.  Offset-0
# prefixes only — offset probes (RIFF/WAVE, ftyp) are handled explicitly.
_MAGIC = [
    (b"\x89PNG\r\n\x1a\n", "image/png"),
    (b"GIF87a", "image/gif"),
    (b"GIF89a", "image/gif"),
    (b"\xff\xd8\xff", "image/jpeg"),
    (b"%PDF-", "application/pdf"),
    (b"PK\x03\x04", "application/zip"),
    (b"\x1f\x8b", "application/gzip"),
    (b"OggS", "audio/ogg"),
]

_TEXT_MIMES = ("text/html", "application/xml", "application/json",
               "text/plain")

# Printable 7-bit ASCII plus tab/newline/carriage-return.
_ASCII_RE = "^[\\x09\\x0a\\x0d\\x20-\\x7e]*$"


def _starts(col: Column, sig: bytes) -> Column:
    return F.substring(col, 1, len(sig)) == F.lit(sig)


def _head(col: Column) -> Column:
    """Payload prefix decoded 1:1 bytes->chars (ISO-8859-1 never fails)."""
    return F.decode(F.substring(col, 1, HEAD_LEN), "ISO-8859-1")


def mime_sniff(col: Column) -> Column:
    """Magic-byte MIME classification; text/plain for clean ASCII,
    application/octet-stream for everything unrecognised."""
    head = _head(col)
    # UTF-8 BOM chars as seen through ISO-8859-1.
    debommed = F.when(_starts(col, b"\xef\xbb\xbf"),
                      F.substring(head, 4, HEAD_LEN)).otherwise(head)
    lhead = F.ltrim(F.lower(debommed))
    expr = None
    for sig, mime in _MAGIC:
        cond = _starts(col, sig)
        expr = F.when(cond, mime) if expr is None else expr.when(cond, mime)
    return (
        expr
        .when(_starts(col, b"RIFF") &
              (F.substring(col, 9, 4) == F.lit(b"WAVE")), "audio/wav")
        .when(F.substring(col, 5, 4) == F.lit(b"ftyp"), "video/mp4")
        .when(lhead.startswith("<?xml"), "application/xml")
        .when(lhead.startswith("<!doctype html") | lhead.startswith("<html"),
              "text/html")
        .when(lhead.rlike("^[\\{\\[]"), "application/json")
        # UTF-16 BOMs are text even though the raw head is not ASCII.
        .when(_starts(col, b"\xff\xfe") | _starts(col, b"\xfe\xff"),
              "text/plain")
        .when(_starts(col, b"\xef\xbb\xbf") &
              F.substring(head, 4, HEAD_LEN).rlike(_ASCII_RE), "text/plain")
        .when(head.rlike(_ASCII_RE), "text/plain")
        .otherwise("application/octet-stream")
    )


def charset_sniff(col: Column, mime: Column) -> Column:
    """Declared/BOM charset for text MIMEs, NULL for binary ones.

    Priority: UTF-16 BOM > UTF-8 BOM > <meta charset>/<?xml encoding?>
    declaration > us-ascii for clean 7-bit text > utf-8 fallback.
    """
    head = _head(col)
    lhead = F.lower(head)
    declared = F.lower(
        F.coalesce(
            F.nullif(F.regexp_extract(
                lhead, "charset\\s*=\\s*[\"']?([a-z0-9_:.\\-]+)", 1), F.lit("")),
            F.nullif(F.regexp_extract(
                lhead, "encoding\\s*=\\s*[\"']([a-z0-9_:.\\-]+)[\"']", 1),
                F.lit("")),
        ))
    body_ascii = F.when(_starts(col, b"\xef\xbb\xbf"),
                        F.substring(head, 4, HEAD_LEN).rlike(_ASCII_RE)
                        ).otherwise(head.rlike(_ASCII_RE))
    return F.when(~mime.isin(*_TEXT_MIMES), F.lit(None).cast("string")) \
        .when(_starts(col, b"\xff\xfe"), "utf-16le") \
        .when(_starts(col, b"\xfe\xff"), "utf-16be") \
        .when(declared.isNotNull(), declared) \
        .when(_starts(col, b"\xef\xbb\xbf"), "utf-8") \
        .when(body_ascii, "us-ascii") \
        .otherwise("utf-8")


def sniff_cols(col: Column) -> dict[str, Column]:
    """All sniff outputs as named Columns for one-Project composition."""
    mime = mime_sniff(col)
    return {
        "mime": mime,
        "charset": charset_sniff(col, mime),
        "has_bom": (_starts(col, b"\xef\xbb\xbf") | _starts(col, b"\xff\xfe")
                    | _starts(col, b"\xfe\xff")),
        "is_text": mime.isin(*_TEXT_MIMES),
    }
