"""Scrape-job configuration (the "query plan" of this engine).

Reference: /root/reference/internal/config/config.go:19-49 (ScraperConfig,
Field), internal/scraper/types.go:23-31 (FieldConfig), validation subset of
config.go:175-239. YAML-declared in the reference; here a YAML/dict-loaded
dataclass tree that the driver compiles into a DataFrame plan.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field
from typing import Any

from ..functions.transforms import VALID_TRANSFORM_TYPES

VALID_FIELD_TYPES = frozenset(
    {"text", "html", "attr", "list", "number", "float", "integer", "boolean",
     "date", "datetime", "time", "url", "email", "phone", "json", "csv",
     "table", "count", "exists", "jsonld", "microdata", "rdfa", "media",
     "main_content", "social_meta", "outline"}
)

# the one field type with an implicit selector: structured-data blocks are
# addressed by their MIME type, not a user CSS path (the reference declares
# the json-ld content processor as a config stub, components.go:31-42)
JSONLD_DEFAULT_SELECTOR = 'script[type="application/ld+json"]'


@dataclass
class FieldConfig:
    name: str
    selector: str
    type: str = "text"
    required: bool = False
    attribute: str = ""
    default: Any = None
    transform: list[dict] = dc_field(default_factory=list)

    def validate(self) -> None:
        """Port of FieldExtractor.validateConfig (extractor.go:150-178)."""
        if not self.name:
            raise ValueError("field name is required")
        if not self.selector and self.type not in ("jsonld", "microdata",
                                                   "rdfa", "media",
                                                   "main_content",
                                                   "social_meta", "outline"):
            raise ValueError("field selector is required")
        if not self.type:
            raise ValueError("field type is required")
        if self.type not in VALID_FIELD_TYPES:
            raise ValueError(f"invalid field type: {self.type}")
        if self.type == "attr" and not self.attribute:
            raise ValueError("attribute name required for attr type")
        for i, rule in enumerate(self.transform):
            if rule.get("type") not in VALID_TRANSFORM_TYPES:
                raise ValueError(
                    f"field {self.name} transform {i}: unknown type "
                    f"{rule.get('type')!r}"
                )


@dataclass
class PaginationConfig:
    type: str = ""                 # offset|cursor|next_button|pages|numbered|url_pattern
    selector: str = ""             # next_button
    limit: int = 10
    max_pages: int = 10
    offset_param: str = "offset"
    limit_param: str = "limit"
    start_offset: int = 0
    max_offset: int = 0
    page_param: str = "page"
    start_page: int = 1
    url_pattern: str = ""          # template with {page}
    cursor_param: str = "cursor"
    cursor_selector: str = ""
    cursor_attr: str = ""
    cursor_pattern: str = ""


@dataclass
class ScraperConfig:
    name: str
    base_url: str = ""
    urls: list[str] = dc_field(default_factory=list)
    fields: list[FieldConfig] = dc_field(default_factory=list)
    pagination: PaginationConfig | None = None
    continue_on_error: bool = True
    output_format: str = "json"
    output_file: str = ""
    requests_per_second: float = 2.0
    burst: int = 5
    max_crawl_delay_s: float = 10.0
    max_pages_per_host: int = 10
    user_agent: str = "DataScrapexter"
    timeout: str = ""                    # Go duration string ("30s")
    retries: int = 0
    error_threshold: int = 0
    error_threshold_percent: float = 0.0

    def validate(self) -> None:
        if not self.name:
            raise ValueError("scraper name is required")
        if not self.fields:
            raise ValueError("at least one field is required")
        for f in self.fields:
            f.validate()

    def validate_extended(self):
        """The reference's enhanced cross-field validation
        (internal/config/validation.go): returns the detailed
        ValidationResult; raises ValueError with the formatted report when
        any error is present."""
        from .config_validation import (
            format_validation_error,
            validate_with_details,
        )

        result = validate_with_details(self)
        if not result.valid:
            raise ValueError(format_validation_error(result))
        return result


def load_config(source: str | dict) -> ScraperConfig:
    """Load from a YAML string/path or a dict (config.go:150-162)."""
    if isinstance(source, str):
        import yaml

        if "\n" not in source and source.endswith((".yaml", ".yml")):
            with open(source) as fh:
                data = yaml.safe_load(fh)
        else:
            data = yaml.safe_load(source)
    else:
        data = source

    fields = [
        FieldConfig(
            name=f["name"],
            selector=f["selector"],
            type=f.get("type", "text"),
            required=bool(f.get("required", False)),
            attribute=f.get("attribute", ""),
            default=f.get("default"),
            transform=list(f.get("transform", []) or []),
        )
        for f in data.get("fields", [])
    ]
    pag = None
    if data.get("pagination"):
        p = data["pagination"]
        pag = PaginationConfig(**{k: v for k, v in p.items()
                                  if k in PaginationConfig.__dataclass_fields__})
    cfg = ScraperConfig(
        name=data.get("name", ""),
        base_url=data.get("base_url", ""),
        urls=list(data.get("urls", []) or []),
        fields=fields,
        pagination=pag,
        continue_on_error=bool(data.get("continue_on_error", True)),
        output_format=(data.get("output", {}) or {}).get("format", "json"),
        output_file=(data.get("output", {}) or {}).get("file", ""),
        timeout=str(data.get("timeout", "") or ""),
        retries=int(data.get("retries", 0) or 0),
        error_threshold=int(data.get("error_threshold", 0) or 0),
        error_threshold_percent=float(
            data.get("error_threshold_percent", 0.0) or 0.0),
    )
    rl = data.get("rate_limit") or {}
    if rl:
        cfg.requests_per_second = float(rl.get("requests_per_second", 2.0))
        cfg.burst = int(rl.get("burst", 5))
    cfg.validate()
    return cfg
