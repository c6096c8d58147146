"""XML sink with the reference writer's document shape.

Reference: /root/reference/internal/output/xml.go —
  declaration + root element (default root "data", record "record",
  2-space indent; xml.go:53-66, 205-220), per-record keys SORTED
  (:230-235), per-element `type` attribute from the value's Go type
  (:502-526: boolean/integer/float/string/datetime/array/object),
  nil -> `<name nil="true"/>` (:254-263), arrays -> item_0..item_N-1
  children with a length attribute (:318-341), maps -> type="object"
  (:297-316), element names sanitized to XML NameChar rules with '_'
  replacement (:369-434).

Spark-first split: record fragments are rendered DISTRIBUTED — one
mapInPandas pass emits a serialized `<record>…</record>` string per row
(fragment rendering is embarrassingly parallel) — and the driver only
concatenates fragments between the root tags, mirroring the reference's
single-file writer without ever holding row objects on the driver.
"""

from __future__ import annotations

import json
import math
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def escape_xml(s: str) -> str:
    """Go encoding/xml char-data escaping (&, <, >, ', ")."""
    return (s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
            .replace("'", "&#39;").replace('"', "&#34;"))


def _name_start_ok(ch: str) -> bool:
    o = ord(ch)
    return (ch in ":_" or "A" <= ch <= "Z" or "a" <= ch <= "z"
            or 0xC0 <= o <= 0xD6 or 0xD8 <= o <= 0xF6 or 0xF8 <= o <= 0x2FF
            or 0x370 <= o <= 0x37D or 0x37F <= o <= 0x1FFF
            or 0x200C <= o <= 0x200D or 0x2070 <= o <= 0x218F
            or 0x2C00 <= o <= 0x2FEF or 0x3001 <= o <= 0xD7FF
            or 0xF900 <= o <= 0xFDCF or 0xFDF0 <= o <= 0xFFFD
            or 0x10000 <= o <= 0xEFFFF)


def _name_ok(ch: str) -> bool:
    o = ord(ch)
    return (_name_start_ok(ch) or ch in "-." or "0" <= ch <= "9"
            or o == 0xB7 or 0x300 <= o <= 0x36F or 0x203F <= o <= 0x2040)


def sanitize_xml_name(name: str) -> str:
    """XML Name sanitization (xml.go sanitizeXMLNameUncached, :409-434)."""
    if not name:
        return "element"
    out = []
    for i, ch in enumerate(name):
        ok = _name_start_ok(ch) if i == 0 else _name_ok(ch)
        out.append(ch if ok else "_")
    return "".join(out) or "element"


def _xml_type(v) -> str:
    """getXMLType parity (xml.go:502-526)."""
    if v is None:
        return "nil"
    if isinstance(v, bool):
        return "boolean"
    if isinstance(v, int):
        return "integer"
    if isinstance(v, float):
        return "float"
    if isinstance(v, str):
        return "string"
    if hasattr(v, "isoformat"):
        return "datetime"
    if isinstance(v, (list, tuple)):
        return "array"
    if isinstance(v, dict):
        return "object"
    return "string"


def _fmt_value(v) -> str:
    """fmt.Sprintf(\"%v\") parity for the common sink types."""
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))  # Go %v uses %g: 3.0 prints as "3"
        return repr(v)
    if isinstance(v, bytes):
        return v.decode("utf-8", "replace")
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return str(v)


def render_element(name: str, value, indent: int, pad: str = "  ") -> str:
    """One element, recursively (writeElement, xml.go:249-275)."""
    nm = sanitize_xml_name(name)
    lead = pad * indent
    if value is None or (isinstance(value, float) and math.isnan(value)):
        return f'{lead}<{nm} nil="true"></{nm}>'
    if isinstance(value, dict):
        inner = "\n".join(
            render_element(k, v, indent + 1, pad)
            for k, v in value.items()
        )
        body = f"\n{inner}\n{lead}" if inner else ""
        return f'{lead}<{nm} type="object">{body}</{nm}>'
    if isinstance(value, (list, tuple)):
        inner = "\n".join(
            render_element(f"item_{i}", v, indent + 1, pad)
            for i, v in enumerate(value)
        )
        body = f"\n{inner}\n{lead}" if inner else ""
        return (f'{lead}<{nm} type="array" length="{len(value)}">'
                f"{body}</{nm}>")
    t = _xml_type(value)
    return f'{lead}<{nm} type="{t}">{escape_xml(_fmt_value(value))}</{nm}>'


def render_record(rec: dict, record_element: str = "record",
                  indent: int = 1, pad: str = "  ") -> str:
    """One sorted-keys record (writeRecord, xml.go:223-246)."""
    lead = pad * indent
    inner = "\n".join(
        render_element(k, rec[k], indent + 1, pad) for k in sorted(rec)
    )
    body = f"\n{inner}\n{lead}" if inner else ""
    return f"{lead}<{record_element}>{body}</{record_element}>"


def xml_fragments_df(df: DataFrame, record_element: str = "record") -> DataFrame:
    """Distributed fragment rendering: one `<record>…</record>` string per
    row (column `fragment`). Values pass through a to_json round-trip so
    nested Spark types arrive as plain dict/list/scalars with exact
    JSON-normalized values on every executor."""
    rec = record_element

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            frags = [
                render_record(json.loads(j), rec) for j in pdf["_json"]
            ]
            yield pd.DataFrame({"fragment": frags}, columns=["fragment"])

    # keep null fields so they render as <name nil="true"/>
    one = df.select(
        F.to_json(F.struct(*df.columns),
                  {"ignoreNullFields": "false"}).alias("_json"))
    return one.mapInPandas(
        run, T.StructType([T.StructField("fragment", T.StringType())]))


def write_xml(df: DataFrame, path: str, root_element: str = "data",
              record_element: str = "record", encoding: str = "UTF-8",
              version: str = "1.0") -> int:
    """Whole-file XML sink (the reference's writer shape); returns record
    count. Fragments render on executors; the driver streams them into one
    file between the root tags."""
    n = 0
    with open(path, "w", encoding="utf-8") as fh:
        fh.write(f'<?xml version="{version}" encoding="{encoding}"?>\n')
        fh.write(f"<{sanitize_xml_name(root_element)}>\n")
        for row in xml_fragments_df(df, record_element).toLocalIterator():
            fh.write(row["fragment"])
            fh.write("\n")
            n += 1
        fh.write(f"</{sanitize_xml_name(root_element)}>\n")
    return n
