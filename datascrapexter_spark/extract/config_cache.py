"""Config cache + templates.

Reference: /root/reference/internal/config/config.go —
  ConfigCache        :241-420  LRU (O(1) doubly-linked list in Go; an
                               OrderedDict here) keyed by path, invalidated
                               by SHA-256 of the file CONTENT, so touching
                               mtime alone never reloads and an edited file
                               always does
  GenerateTemplate   :737-836  ecommerce / news / basic starter configs
                               (RateLimit "2s"/"3s"/"1s" -> rps 0.5/0.33/1)

Driver-side machinery only — nothing here touches Spark.
"""

from __future__ import annotations

import hashlib
from collections import OrderedDict
from dataclasses import dataclass, field as dc_field

from .config import FieldConfig, ScraperConfig, load_config


@dataclass
class CacheStats:
    hits: int = 0
    misses: int = 0
    evictions: int = 0


@dataclass
class _Entry:
    sha256: str
    config: ScraperConfig


class ConfigCache:
    """Thread-unsafe (driver-only) LRU config cache with content-hash
    invalidation. capacity <= 0 disables caching entirely."""

    def __init__(self, capacity: int = 32):
        self.capacity = capacity
        self._entries: OrderedDict[str, _Entry] = OrderedDict()
        self.stats = CacheStats()

    @staticmethod
    def _hash_file(path: str) -> str:
        h = hashlib.sha256()
        with open(path, "rb") as fh:
            for chunk in iter(lambda: fh.read(1 << 16), b""):
                h.update(chunk)
        return h.hexdigest()

    def get(self, path: str) -> ScraperConfig:
        sha = self._hash_file(path)
        entry = self._entries.get(path)
        if entry is not None and entry.sha256 == sha:
            self._entries.move_to_end(path)
            self.stats.hits += 1
            return entry.config
        self.stats.misses += 1
        cfg = load_config(path)
        if self.capacity > 0:
            self._entries[path] = _Entry(sha, cfg)
            self._entries.move_to_end(path)
            while len(self._entries) > self.capacity:
                self._entries.popitem(last=False)
                self.stats.evictions += 1
        return cfg

    def invalidate(self, path: str | None = None) -> None:
        if path is None:
            self._entries.clear()
        else:
            self._entries.pop(path, None)

    def __len__(self) -> int:
        return len(self._entries)


_default_cache = ConfigCache()


def load_config_cached(path: str, cache: ConfigCache | None = None) -> ScraperConfig:
    return (cache or _default_cache).get(path)


def generate_template(template_type: str = "basic") -> ScraperConfig:
    """GenerateTemplate parity (config.go:737-836). RateLimit duration
    strings map to requests_per_second = 1/delay."""
    if template_type == "ecommerce":
        return ScraperConfig(
            name="ecommerce_scraper",
            base_url="https://example-shop.com/products",
            fields=[
                FieldConfig(name="title", selector=".product-title, h1",
                            type="text", required=True),
                FieldConfig(name="price", selector=".price, .product-price",
                            type="text", required=True),
                FieldConfig(name="description",
                            selector=".product-description", type="text"),
                FieldConfig(name="image", selector=".product-image img",
                            type="attr", attribute="src"),
            ],
            output_format="json", output_file="products.json",
            requests_per_second=0.5,   # RateLimit "2s"
        )
    if template_type == "news":
        return ScraperConfig(
            name="news_scraper",
            base_url="https://example-news.com/articles",
            fields=[
                FieldConfig(name="headline", selector="h1, .headline",
                            type="text", required=True),
                FieldConfig(name="author", selector=".author, .byline",
                            type="text"),
                FieldConfig(name="content",
                            selector=".article-content, .story-body",
                            type="text", required=True),
                FieldConfig(name="date", selector=".publish-date, time",
                            type="text"),
            ],
            output_format="json", output_file="articles.json",
            requests_per_second=1.0 / 3.0,  # RateLimit "3s"
        )
    return ScraperConfig(
        name="basic_scraper",
        base_url="https://example.com",
        fields=[
            FieldConfig(name="title", selector="h1", type="text",
                        required=True),
            FieldConfig(name="content", selector="p", type="text"),
        ],
        output_format="json", output_file="output.json",
        requests_per_second=1.0,        # RateLimit "1s"
    )
