"""Extended config validation — the reference's enhanced validator.

Reference: /root/reference/internal/config/validation.go (452 LoC):
ValidationError/ValidationResult shapes (:12-25), basic-field checks
(:57-81), URL scheme/host checks + http warning (:84-121), per-field
checks incl. duplicate names, CSS selector lint, attr-requires-attribute
(:124-189), transform checks incl. regex compile (:192-225), output-format
whitelist + stdout warning (:228-252), engine settings: duration parsing,
negative bounds, sub-500ms rate warning, >60s timeout warning (:255-312),
formatValidationError (:349-373), GetValidationSuggestions (:392-441).
Durations parse with Go time.ParseDuration grammar (pkg/types/types.go:
233-270 usage).

Differences, deliberate: the valid field-type and output-format sets are
THIS engine's full supported surface (19 field types, sinks incl. parquet/
xml/sqlite) rather than validation.go's stale 8-type list — the reference's
own shipped configs use types its enhanced validator would reject; and the
CSS lint checks quote balance + obviously-broken sequences but not
validation.go's bracket ban (:322-325), which would reject the reference's
own `a[href]` selectors. Both divergences are lints relaxed toward what
the engines actually execute.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field as dc_field
from urllib.parse import urlsplit

from ..functions.transforms import VALID_TRANSFORM_TYPES
from .config import VALID_FIELD_TYPES, ScraperConfig

VALID_OUTPUT_FORMATS = ("json", "jsonl", "csv", "yaml", "parquet", "xml",
                        "sqlite", "jdbc", "postgresql", "stdout")

_GO_DURATION_RE = re.compile(r"(\d+(?:\.\d+)?)(ns|us|µs|μs|ms|s|m|h)")
_GO_UNIT_S = {"ns": 1e-9, "us": 1e-6, "µs": 1e-6, "μs": 1e-6,
              "ms": 1e-3, "s": 1.0, "m": 60.0, "h": 3600.0}


def parse_go_duration(s: str) -> float:
    """Go time.ParseDuration subset -> seconds ("300ms", "1.5h", "1m30s";
    a leading '-' negates). Raises ValueError on anything it rejects."""
    raw = s.strip()
    if not raw:
        raise ValueError("empty duration")
    sign = 1.0
    body = raw
    if body[0] in "+-":
        sign = -1.0 if body[0] == "-" else 1.0
        body = body[1:]
    if body in ("0",):
        return 0.0
    pos, total = 0, 0.0
    for m in _GO_DURATION_RE.finditer(body):
        if m.start() != pos:
            raise ValueError(f"invalid duration: {s!r}")
        total += float(m.group(1)) * _GO_UNIT_S[m.group(2)]
        pos = m.end()
    if pos != len(body) or pos == 0:
        raise ValueError(f"invalid duration: {s!r}")
    return sign * total


@dataclass
class ValidationError:
    field: str
    value: str
    message: str


@dataclass
class ValidationResult:
    valid: bool = True
    errors: list[ValidationError] = dc_field(default_factory=list)
    warnings: list[str] = dc_field(default_factory=list)

    def err(self, field: str, value, message: str) -> None:
        self.errors.append(ValidationError(field, str(value or ""), message))

    def warn(self, message: str) -> None:
        self.warnings.append(message)


def lint_css_selector(selector: str) -> str | None:
    """Basic selector lint (validateCSSSelector, :315-345, minus the
    bracket ban — see module docstring). Returns an error message or None."""
    s = selector.strip()
    if not s:
        return "empty selector"
    for bad in ("<<", ">>", "|||", "&&&", "{", "}"):
        if bad in s:
            return f"invalid character sequence: {bad}"
    if s.count("'") % 2:
        return "unclosed single quote"
    if s.count('"') % 2:
        return "unclosed double quote"
    return None


def _check_url(result: ValidationResult, field: str, url: str) -> None:
    try:
        parts = urlsplit(url)
    except ValueError as e:  # pragma: no cover - urlsplit rarely raises
        result.err(field, url, f"Invalid URL format: {e}")
        return
    if not parts.scheme:
        result.err(field, url,
                   "URL must include protocol (http:// or https://)")
    if not parts.netloc:
        result.err(field, url, "URL must include hostname")
    if parts.scheme == "http":
        result.warn("Using HTTP instead of HTTPS may cause security issues")


def validate_with_details(cfg: ScraperConfig) -> ValidationResult:
    """The enhanced cross-field validator (ValidateWithDetails parity)."""
    r = ValidationResult()

    # --- basic fields (:57-81) ---
    if not cfg.name:
        r.err("name", "", "Scraper name is required")
    if not cfg.base_url and not cfg.urls:
        r.err("base_url", "", "Base URL or urls list is required")
    if not cfg.fields:
        r.err("fields", "[]", "At least one field must be configured")

    # --- URLs (:84-121) ---
    if cfg.base_url:
        _check_url(r, "base_url", cfg.base_url)
    for i, u in enumerate(cfg.urls):
        _check_url(r, f"urls[{i}]", u)

    # --- fields (:124-189) ---
    seen_names: set[str] = set()
    for i, f in enumerate(cfg.fields):
        p = f"fields[{i}]"
        if not f.name:
            r.err(f"{p}.name", "", "Field name is required")
        if f.name in seen_names:
            r.err(f"{p}.name", f.name, f"Duplicate field name: {f.name}")
        seen_names.add(f.name)
        if not f.selector:
            r.err(f"{p}.selector", "", "CSS selector is required")
        else:
            msg = lint_css_selector(f.selector)
            if msg:
                r.err(f"{p}.selector", f.selector,
                      f"Invalid CSS selector: {msg}")
        if f.type not in VALID_FIELD_TYPES:
            r.err(f"{p}.type", f.type,
                  "Invalid field type. Valid types: "
                  + ", ".join(sorted(VALID_FIELD_TYPES)))
        if f.type == "attr" and not f.attribute:
            r.err(f"{p}.attribute", "",
                  "Attribute name is required for 'attr' type fields")

        # --- transforms (:192-225) ---
        for j, rule in enumerate(f.transform):
            tp = f"{p}.transform[{j}]"
            rtype = rule.get("type", "")
            if not rtype:
                r.err(f"{tp}.type", "", "Transform type is required")
                continue
            if rtype not in VALID_TRANSFORM_TYPES:
                r.err(f"{tp}.type", rtype,
                      f"Unknown transform type: {rtype}")
            if rtype == "regex":
                pattern = rule.get("pattern", "")
                if not pattern:
                    r.err(f"{tp}.pattern", "",
                          "Pattern is required for regex transforms")
                else:
                    try:
                        re.compile(pattern)
                    except re.error as e:
                        r.err(f"{tp}.pattern", pattern,
                              f"Invalid regex pattern: {e}")

    # --- output (:228-252) ---
    fmt = cfg.output_format
    if not fmt:
        r.err("output.format", "", "Output format is required")
    elif fmt not in VALID_OUTPUT_FORMATS:
        r.err("output.format", fmt,
              "Invalid output format. Valid formats: "
              + ", ".join(VALID_OUTPUT_FORMATS))
    if not getattr(cfg, "output_file", ""):
        r.warn("No output file specified, results will be written to stdout")

    # --- engine settings (:255-312) ---
    if cfg.requests_per_second < 0:
        r.err("rate_limit.requests_per_second", cfg.requests_per_second,
              "Rate limit cannot be negative")
    elif cfg.requests_per_second > 2.0:
        r.warn("Rate limit below 500ms may overwhelm target servers")
    if cfg.burst < 0:
        r.err("rate_limit.burst", cfg.burst, "Burst cannot be negative")
    if getattr(cfg, "timeout", ""):
        try:
            d = parse_go_duration(cfg.timeout)
            if d < 0:
                r.err("timeout", cfg.timeout, "Timeout cannot be negative")
            elif d > 60.0:
                r.warn("Timeout above 60 seconds may cause unnecessary "
                       "delays")
        except ValueError as e:
            r.err("timeout", cfg.timeout, f"Invalid timeout format: {e}")
    if getattr(cfg, "retries", 0) < 0:
        r.err("retries", cfg.retries, "Retries cannot be negative")
    et = getattr(cfg, "error_threshold", 0)
    if et < 0:
        r.err("error_threshold", et,
              f"error_threshold must be non-negative, got {et}")
    etp = getattr(cfg, "error_threshold_percent", 0.0)
    if not 0.0 <= etp <= 100.0:
        r.err("error_threshold_percent", etp,
              f"error_threshold_percent must be between 0 and 100, got {etp}")
    if cfg.max_pages_per_host < 0:
        r.err("max_pages_per_host", cfg.max_pages_per_host,
              "max pages per host cannot be negative")

    r.valid = not r.errors
    return r


def format_validation_error(result: ValidationResult) -> str:
    """formatValidationError parity (:349-373)."""
    out = ["Configuration validation failed:"]
    for i, e in enumerate(result.errors, 1):
        line = f"  {i}. {e.message}"
        if e.field:
            line += f" (field: {e.field})"
        if e.value:
            line += f" (value: {e.value})"
        out.append(line)
    if result.warnings:
        out.append("")
        out.append("Warnings:")
        for i, w in enumerate(result.warnings, 1):
            out.append(f"  {i}. {w}")
    return "\n".join(out) + "\n"


def validation_suggestions(result: ValidationResult) -> list[str]:
    """GetValidationSuggestions parity (:392-441)."""
    has_url = any("url" in e.field for e in result.errors)
    has_sel = any("selector" in e.field for e in result.errors)
    has_field = any("fields" in e.field for e in result.errors)
    out: list[str] = []
    if has_url:
        out += ["Ensure URLs include protocol (http:// or https://)",
                "Verify domain names are correct",
                "Test URLs in a browser first"]
    if has_sel:
        out += ["Test CSS selectors using browser developer tools",
                "Use the browser's element inspector to generate selectors",
                "Start with simple selectors and make them more specific "
                "as needed"]
    if has_field:
        out += ["Ensure all field names are unique",
                "Check that required field properties are set",
                "Verify field types match expected data"]
    if not out:
        out += ["Review the configuration file for syntax errors",
                "Check YAML indentation and formatting",
                "Ensure all required fields are present"]
    return out
