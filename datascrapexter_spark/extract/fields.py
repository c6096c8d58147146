"""Per-field extraction: exact port of the reference's typed extractors.

Reference: /root/reference/internal/scraper/extractor.go
  extractRawValue switch       :183-262
  getDefaultValue              :265-286
  extractNumber / Integer      :289-328   (regexes :25-26)
  extractBoolean               :339-395
  extractDate / DateTime / Time:398-494
  extractURL + findDocumentBaseURL :504-575
  extractEmail / Phone         :578-630   (regexes :27-30)
  extractJSON / CSV / Table    :633-737
  ExtractionEngine.ExtractAll  :98-147    (error severity, continue_on_error)
  transforms applied to the stringified value: extractor.go:81-90

Pure-Python — runs inside Arrow-batch UDFs (extract/engine.py) and inside
the sequential oracle simulator used by the crawl fixtures. The extracted
`text` field is the byte-identical invariant surface vs the reference.
"""

from __future__ import annotations

import csv as _csv
import io
import json as _json
import re
from dataclasses import dataclass
from datetime import datetime
from typing import Any
from urllib.parse import urljoin, urlsplit

from ..functions.transforms import TransformError, apply_chain, go_trim_space
from ..html import Node, matches, select
from .config import FieldConfig

# extractor.go:25-30
_NUMBER_RE = re.compile(r"[+-]?\d+(\.\d+)?")
_INTEGER_RE = re.compile(r"[+-]?\d+")
_EMAIL_RE = re.compile(r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}")
_PHONE_RE = re.compile(
    r"\+[1-9]\d{0,3}[-.\s]*\(?[0-9]{1,4}\)?[-.\s]*[0-9]{1,4}[-.\s]*[0-9]{1,9}"
)
_LOCAL_PHONE_RE = re.compile(r"0[0-9]{2,3}[-.\s]*[0-9]{3,4}[-.\s]*[0-9]{3,4}")
_PHONE_CLEAN_RE = re.compile(r"[^\d+]")

# extractor.go:355-373
_TRUE_VALUES = frozenset(
    {"true", "yes", "1", "on", "enabled", "active", "available", "checked",
     "selected", "valid"}
)
_FALSE_VALUES = frozenset(
    {"false", "no", "0", "off", "disabled", "inactive", "unavailable",
     "unchecked", "unselected", "invalid", "null", "none", "empty",
     "out of stock", "sold out", "not available", "not in stock",
     "temporarily unavailable", "discontinued", "coming soon", "pre-order",
     "pending", "suspended", "expired", "closed", "locked", "blocked"}
)

# Go layout -> (python strptime fmt); order preserved from extractor.go
_DATE_FORMATS = [
    "%Y-%m-%d", "%m/%d/%Y", "%d/%m/%Y", "%B %d, %Y", "%b %d, %Y",
    "%Y-%m-%dT%H:%M:%SZ", "%Y-%m-%dT%H:%M:%S%z",
]
_DATETIME_FORMATS = [
    "%Y-%m-%dT%H:%M:%SZ", "%Y-%m-%dT%H:%M:%S%z", "%Y-%m-%d %H:%M:%S",
    "%m/%d/%Y %H:%M:%S", "%B %d, %Y %I:%M %p", "%b %d, %Y %I:%M %p",
    "%Y-%m-%d",
]
_TIME_FORMATS = ["%H:%M:%S", "%H:%M", "%I:%M %p", "%I:%M:%S %p"]


class ExtractionFailed(ValueError):
    """Raw extraction / transform failure (Go: error return)."""


@dataclass
class FieldError:
    field_name: str
    selector: str
    message: str
    code: str = "EXTRACTION_FAILED"
    severity: str = "ERROR"


def _strptime(text: str, fmt: str) -> datetime | None:
    try:
        return datetime.strptime(text, fmt)
    except ValueError:
        return None


def _extract_number(node: Node) -> float:
    text = go_trim_space(node.text())
    if text == "":
        return 0.0
    m = _NUMBER_RE.search(text)
    if not m:
        raise ExtractionFailed(f"no numeric value found in: {text}")
    return float(m.group(0))


def _extract_integer(node: Node) -> int:
    text = go_trim_space(node.text())
    if text == "":
        return 0
    m = _INTEGER_RE.search(text)
    if not m:
        raise ExtractionFailed(f"no integer value found in: {text}")
    return int(m.group(0))


def _extract_boolean(node: Node) -> bool:
    text = go_trim_space(node.text()).lower()
    if text in _TRUE_VALUES:
        return True
    if text in _FALSE_VALUES:
        return False
    if text == "":
        if node.has_class("active") or node.has_class("enabled") or node.has_class("checked"):
            return True
        if node.has_class("disabled") or node.has_class("inactive") or node.has_class("unchecked"):
            return False
        if node.attr("checked") is not None:
            return True
        if node.attr("disabled") is not None:
            return False
        return False
    # unrecognized non-empty text -> true (documented reference behavior)
    return True


def _extract_date(node: Node) -> str:
    text = node.attr("datetime")
    if text is None:
        text = go_trim_space(node.text())
    if text == "":
        return ""
    for fmt in _DATE_FORMATS:
        parsed = _strptime(text, fmt)
        if parsed is not None:
            return parsed.strftime("%Y-%m-%d")
    raise ExtractionFailed(f"failed to parse date: '{text}'")


def _extract_datetime(node: Node) -> str:
    text = node.attr("datetime")
    if text is None:
        text = go_trim_space(node.text())
    if text == "":
        return ""
    for fmt in _DATETIME_FORMATS:
        parsed = _strptime(text, fmt)
        if parsed is not None:
            # Go formats the WALL time with a literal Z (no tz conversion)
            return parsed.strftime("%Y-%m-%dT%H:%M:%SZ")
    return text  # unparsable -> passthrough with warning (extractor.go:466-468)


def _extract_time(node: Node) -> str:
    text = go_trim_space(node.text())
    if text == "":
        return ""
    for fmt in _TIME_FORMATS:
        parsed = _strptime(text, fmt)
        if parsed is not None:
            return parsed.strftime("%H:%M:%S")
    return text


def _find_document_base_url(doc: Node) -> str | None:
    """findDocumentBaseURL (extractor.go:546-575): <base href> first, then
    <link rel=canonical>'s scheme+host."""
    for base in select(doc, "base[href]"):
        href = base.attr("href")
        if href:
            try:
                if urlsplit(href).scheme:
                    return href
            except ValueError:
                pass
        break
    for canon in select(doc, "link[rel='canonical'][href]"):
        href = canon.attr("href")
        if href:
            try:
                parts = urlsplit(href)
                if parts.scheme:
                    return f"{parts.scheme}://{parts.netloc}"
            except ValueError:
                pass
        break
    return None


def _extract_url(node: Node, doc: Node) -> str:
    url_str = node.attr("href")
    if url_str is None:
        url_str = node.attr("src")
    if url_str is None:
        url_str = go_trim_space(node.text())
    if url_str == "":
        return ""
    try:
        parsed = urlsplit(url_str)
    except ValueError as e:
        raise ExtractionFailed(f"invalid URL '{url_str}': {e}") from e
    if parsed.scheme == "":
        base = _find_document_base_url(doc)
        if base is not None:
            return urljoin(base, url_str)
    return url_str


def _extract_email(node: Node) -> str:
    text = go_trim_space(node.text())
    href = node.attr("href")
    if href is not None and href.startswith("mailto:"):
        text = href[len("mailto:"):]
    if text == "":
        return ""
    m = _EMAIL_RE.search(text)
    if not m:
        raise ExtractionFailed(f"no valid email found in: {text}")
    return m.group(0)


def _extract_phone(node: Node) -> str:
    text = go_trim_space(node.text())
    href = node.attr("href")
    if href is not None and href.startswith("tel:"):
        text = href[len("tel:"):]
    if text == "":
        return ""
    m = _LOCAL_PHONE_RE.search(text)
    if not m:
        m = _PHONE_RE.search(text)
        if not m:
            raise ExtractionFailed(f"no valid phone number found in: {text}")
    return _PHONE_CLEAN_RE.sub("", m.group(0))


def _extract_json(node: Node) -> Any:
    text = go_trim_space(node.text())
    if text == "":
        return None
    try:
        return _json.loads(text)
    except ValueError as e:
        raise ExtractionFailed(f"failed to parse JSON: {e}") from e


def _extract_jsonld(nodes: list[Node]) -> Any:
    """JSON-LD structured data: parse every matched
    script[type="application/ld+json"] block; a single block yields its
    parsed tree, several yield a list (a page often carries one
    Organization + one Product graph). The reference declares this content
    processor as a config stub (internal/pipeline/components.go:31-42) —
    implemented fully here."""
    parsed = []
    for node in nodes:
        text = go_trim_space(node.text())
        if text == "":
            continue
        try:
            parsed.append(_json.loads(text))
        except ValueError as e:
            raise ExtractionFailed(f"failed to parse JSON-LD: {e}") from e
    if not parsed:
        return None
    return parsed[0] if len(parsed) == 1 else parsed


_MICRODATA_VALUE_ATTR = {
    # HTML microdata property-value rules (whatwg spec §5.2.4), the same
    # table the reference's declared-but-stubbed microdata processor
    # (internal/pipeline/components.go:31-42) would implement
    "meta": "content",
    "audio": "src", "embed": "src", "iframe": "src", "img": "src",
    "source": "src", "track": "src", "video": "src",
    "a": "href", "area": "href", "link": "href",
    "object": "data",
    "data": "value", "meter": "value",
    "time": "datetime",
}


def _microdata_prop_value(node: Node) -> str:
    attr_name = _MICRODATA_VALUE_ATTR.get(node.tag or "")
    if attr_name is not None:
        v = node.attr(attr_name)
        if v is not None:
            return v
    return go_trim_space(node.text())


def _microdata_item(node: Node) -> dict:
    """One itemscope element -> {type?, properties{name: [values]}}.
    Nested itemscope+itemprop elements become nested items; descent stops
    at nested scopes (their props belong to the nested item)."""
    item: dict = {}
    itype = node.attr("itemtype")
    if itype:
        item["type"] = go_trim_space(itype)
    props: dict[str, list] = {}

    def walk(n: Node) -> None:
        for child in n.element_children():
            prop = child.attr("itemprop")
            is_scope = child.attr("itemscope") is not None
            if prop:
                value = (_microdata_item(child) if is_scope
                         else _microdata_prop_value(child))
                for name in prop.split():
                    props.setdefault(name, []).append(value)
            if not is_scope:
                walk(child)

    walk(node)
    item["properties"] = dict(sorted(props.items()))
    return item


# OpenGraph + Twitter-card metas, addressed by attribute prefix like
# jsonld's MIME-type selector (no user CSS path needed)
SOCIAL_META_DEFAULT_SELECTOR = \
    'meta[property^="og:"], meta[name^="twitter:"]'


def _extract_social_meta(nodes: list[Node]) -> Any:
    """Social-share metadata rollup: {og:*/twitter:* key: content}.
    First occurrence wins in document order — the de-facto consumer
    rule (Facebook's and Twitter's parsers read the first tag). The
    reference extracts metas only via per-field attr selectors; this is
    the one-config-line rollup a scraper actually wants."""
    out: dict[str, str] = {}
    for node in nodes:
        key = go_trim_space(node.attr("property") or node.attr("name")
                            or "")
        if key and key not in out:
            out[key] = node.attr("content") or ""
    return out or None


def _extract_microdata(nodes: list[Node]) -> Any:
    """Microdata structured data: one item -> its dict, several -> a
    list (mirrors _extract_jsonld's shape)."""
    items = [_microdata_item(n) for n in nodes]
    if not items:
        return None
    return items[0] if len(items) == 1 else items


def _rdfa_prop_value(node: Node) -> str:
    """RDFa Lite property value: content attr wins, then the tag's
    resource attr (same table as microdata), then text content."""
    content = node.attr("content")
    if content is not None:
        return content
    attr_name = _MICRODATA_VALUE_ATTR.get(node.tag or "")
    if attr_name is not None:
        v = node.attr(attr_name)
        if v is not None:
            return v
    return go_trim_space(node.text())


def _rdfa_item(node: Node, vocab: str | None = None) -> dict:
    """One typeof element -> {type, vocab?, properties{name: [values]}}
    (RDFa Lite: vocab inherits down, typeof starts a new item, property
    collects; nested typeof+property becomes a nested item)."""
    item: dict = {}
    t = node.attr("typeof")
    if t:
        item["type"] = go_trim_space(t)
    v = node.attr("vocab") or vocab
    if v:
        item["vocab"] = go_trim_space(v)
    props: dict[str, list] = {}

    def walk(n: Node) -> None:
        for child in n.element_children():
            prop = child.attr("property")
            has_typeof = child.attr("typeof") is not None
            if prop:
                value = (_rdfa_item(child, v) if has_typeof
                         else _rdfa_prop_value(child))
                for name in prop.split():
                    props.setdefault(name, []).append(value)
            if not has_typeof:
                walk(child)

    walk(node)
    item["properties"] = dict(sorted(props.items()))
    return item


def _extract_rdfa(nodes: list[Node]) -> Any:
    """RDFa Lite structured data (the third declared-but-stubbed content
    processor, components.go:31-42); shape mirrors _extract_microdata."""
    # vocab may be declared on an ancestor of the item; resolve upward
    def inherited_vocab(n: Node) -> str | None:
        p = n.parent
        while p is not None:
            v = p.attr("vocab")
            if v:
                return v
            p = p.parent
        return None

    items = [_rdfa_item(n, inherited_vocab(n)) for n in nodes]
    if not items:
        return None
    return items[0] if len(items) == 1 else items


_MEDIA_DEFAULT_SELECTOR = "img, video, audio, source"

OUTLINE_DEFAULT_SELECTOR = "h1, h2, h3, h4, h5, h6"


def _extract_outline(nodes: list[Node]) -> list[dict]:
    """Document heading outline: one {level, text} row per h1-h6 in
    document order — the structure signal behind TOC building, section
    chunking, and content-quality heuristics (a page with no headings at
    depth > 1 is usually a listing/boilerplate page)."""
    return [{"level": str(int(n.tag[1])), "text": go_trim_space(n.text())}
            for n in nodes]


def _extract_media(nodes: list[Node]) -> list[dict]:
    """Media extractor (the reference's declared media content processor,
    components.go:38-42): one row per media element — kind/src/alt/type
    as a uniform string map (absent attrs -> absent keys)."""
    out = []
    for n in nodes:
        entry: dict[str, str] = {"kind": n.tag or ""}
        src = n.attr("src") or n.attr("srcset")
        if src is not None:
            entry["src"] = src
        for a in ("alt", "type", "poster"):
            v = n.attr(a)
            if v is not None:
                entry[a] = v
        out.append(entry)
    return out


def _extract_csv(node: Node) -> list[list[str]]:
    text = go_trim_space(node.text())
    if text == "":
        return None
    try:
        return list(_csv.reader(io.StringIO(text)))
    except _csv.Error as e:
        raise ExtractionFailed(f"failed to parse CSV: {e}") from e


def _extract_table(nodes: list[Node]) -> dict:
    """extractTable (extractor.go:664-737). `nodes` = full selection."""
    table = None
    for n in nodes:  # Filter("table").First()
        if matches(n, "table"):
            table = n
            break
    if table is None:  # selection.Find("table").First()
        for n in nodes:
            found = select(n, "table")
            if found:
                table = found[0]
                break
    if table is None:
        raise ExtractionFailed("no table found")

    headers: list[str] = []
    for th in select(table, "thead tr th, tbody tr:first-child th, tr:first-child th"):
        headers.append(go_trim_space(th.text()))

    if not headers:
        first_rows = select(table, "tbody tr, tr")
        if first_rows:
            cells = select(first_rows[0], "td, th")
            headers = [f"column_{i + 1}" for i in range(len(cells))]

    rows: list[dict] = []

    def walk_rows(row_nodes: list[Node], skip_header_heuristic: bool):
        for i, row in enumerate(row_nodes):
            if skip_header_heuristic and i == 0 and select(row, "th"):
                continue
            row_data = {}
            for j, cell in enumerate(select(row, "td")):
                if j < len(headers):
                    row_data[headers[j]] = go_trim_space(cell.text())
            if row_data:
                rows.append(row_data)

    if select(table, "tbody"):
        walk_rows(select(table, "tbody tr"), skip_header_heuristic=False)
    else:
        walk_rows(select(table, "tr"), skip_header_heuristic=True)

    return {"headers": headers, "rows": rows, "count": len(rows)}


def get_default_value(cfg: FieldConfig) -> Any:
    """getDefaultValue (extractor.go:265-286)."""
    if cfg.default is not None:
        return cfg.default
    t = cfg.type
    if t in ("text", "html", "attr", "url", "email", "phone", "date",
             "datetime", "time", "main_content"):
        return ""
    if t in ("list", "csv"):
        return []
    if t in ("number", "float"):
        return 0.0
    if t in ("integer", "count"):
        return 0
    if t in ("boolean", "exists"):
        return False
    if t in ("json", "jsonld", "microdata", "rdfa", "table",
             "social_meta"):
        return {}
    if t in ("media", "outline"):
        return []
    return ""


def extract_raw_value(doc: Node, cfg: FieldConfig) -> Any:
    """extractRawValue (extractor.go:183-262). Returns None if no match."""
    selector = cfg.selector
    if cfg.type == "jsonld" and not selector:
        from .config import JSONLD_DEFAULT_SELECTOR

        selector = JSONLD_DEFAULT_SELECTOR
    if cfg.type == "microdata" and not selector:
        # top-level items = itemscope WITHOUT itemprop (nested items carry
        # itemprop and are reached through their parent)
        selection = [n for n in select(doc, "[itemscope]")
                     if not n.attr("itemprop")]
    elif cfg.type == "rdfa" and not selector:
        # top-level items = typeof WITHOUT property
        selection = [n for n in select(doc, "[typeof]")
                     if not n.attr("property")]
    elif cfg.type == "media" and not selector:
        selection = select(doc, _MEDIA_DEFAULT_SELECTOR)
    elif cfg.type == "outline" and not selector:
        selection = select(doc, OUTLINE_DEFAULT_SELECTOR)
    elif cfg.type == "social_meta" and not selector:
        selection = select(doc, SOCIAL_META_DEFAULT_SELECTOR)
    elif cfg.type == "main_content" and not selector:
        # whole-document boilerplate removal by default; a selector
        # scopes classification to that subtree
        selection = [doc]
    else:
        selection = select(doc, selector)
    if not selection:
        return None
    first = selection[0]
    t = cfg.type
    if t == "text":
        return go_trim_space(first.text())
    if t == "main_content":
        from .content import classify_blocks

        return classify_blocks(first)["main_text"]
    if t == "html":
        return first.inner_html()
    if t == "attr":
        return first.attr(cfg.attribute)  # None if absent (Go: nil, nil)
    if t == "list":
        return [go_trim_space(n.text()) for n in selection]
    if t in ("number", "float"):
        return _extract_number(first)
    if t == "integer":
        return _extract_integer(first)
    if t == "boolean":
        return _extract_boolean(first)
    if t == "date":
        return _extract_date(first)
    if t == "datetime":
        return _extract_datetime(first)
    if t == "time":
        return _extract_time(first)
    if t == "url":
        return _extract_url(first, doc)
    if t == "email":
        return _extract_email(first)
    if t == "phone":
        return _extract_phone(first)
    if t == "json":
        return _extract_json(first)
    if t == "jsonld":
        return _extract_jsonld(selection)
    if t == "microdata":
        return _extract_microdata(selection)
    if t == "rdfa":
        return _extract_rdfa(selection)
    if t == "media":
        return _extract_media(selection)
    if t == "outline":
        return _extract_outline(selection)
    if t == "social_meta":
        return _extract_social_meta(selection)
    if t == "csv":
        return _extract_csv(first)
    if t == "table":
        return _extract_table(selection)
    if t == "count":
        return len(selection)
    if t == "exists":
        return len(selection) > 0
    raise ExtractionFailed(f"unsupported field type: {t}")


def go_sprintf_v(value: Any) -> str:
    """fmt.Sprintf("%v", value) for the types this engine produces
    (extractor.go:84: transforms run on the stringified value)."""
    if isinstance(value, str):
        return value
    if isinstance(value, bool):
        return "true" if value else "false"
    if isinstance(value, float):
        return _go_format_float(value)
    if isinstance(value, int):
        return str(value)
    if isinstance(value, list):
        return "[" + " ".join(go_sprintf_v(v) for v in value) + "]"
    if value is None:
        return "<nil>"
    return str(value)


def _go_format_float(f: float) -> str:
    """strconv.FormatFloat(f, 'g', -1, 64): shortest round-trip repr, exponent
    when exp < -4 or >= 21."""
    r = repr(f)
    if "e" not in r and "E" not in r:
        if r.endswith(".0"):
            # Go prints integral floats without trailing .0 only in %v? No:
            # FormatFloat 'g' of 2.0 -> "2".
            return r[:-2]
        return r
    mant, exp = r.split("e")
    exp_i = int(exp)
    if -4 <= exp_i < 21:
        return f"{f:.17g}" if f != int(f) else str(int(f))
    sign = "+" if exp_i >= 0 else "-"
    return f"{mant}e{sign}{abs(exp_i):02d}"


def extract_field(doc: Node, cfg: FieldConfig) -> Any:
    """FieldExtractor.Extract (extractor.go:66-96): raw value, required/
    default handling, then transform chain on the stringified value."""
    cfg.validate()
    value = extract_raw_value(doc, cfg)
    if value is None:
        if cfg.required:
            raise ExtractionFailed(f"required field '{cfg.name}' not found")
        return get_default_value(cfg)
    if cfg.transform:
        try:
            value = apply_chain(cfg.transform, go_sprintf_v(value))
        except TransformError as e:
            raise ExtractionFailed(f"transformation failed: {e}") from e
    return value


def extract_all(doc: Node, fields: list[FieldConfig],
                continue_on_error: bool = True) -> tuple[dict, list[FieldError], bool]:
    """ExtractionEngine.ExtractAll (extractor.go:98-147).

    Returns (data, errors, success)."""
    data: dict[str, Any] = {}
    errors: list[FieldError] = []
    failed = 0
    required_ok = True
    for cfg in fields:
        try:
            data[cfg.name] = extract_field(doc, cfg)
        except (ExtractionFailed, ValueError) as e:
            failed += 1
            err = FieldError(cfg.name, cfg.selector, str(e))
            if cfg.required:
                err.severity = "CRITICAL"
                required_ok = False
            errors.append(err)
            if not continue_on_error:
                break
    success = required_ok and (continue_on_error or failed == 0)
    return data, errors, success
