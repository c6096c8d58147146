"""Public high-level client facade.

Reference: pkg/api/api.go — the library's supported entry point:
re-exported config types (api.go:12-17), `ScraperClient` with
NewScraperClient / Scrape / ScrapeParallel / EnableMetrics
(api.go:20-82), and the URL-precedence rule `urls` over `base_url`
(api.go:83-91). The reference's Scrape body is a mock that returns
fixture rows (api.go:44-52); the declared surface is the contract, and
here it executes the real engine (`run.run_scrape_job`).

Results come back as list[dict] rows — the Python shape of
[]map[string]interface{}. `scrape_parallel` exists for drop-in
compatibility: the Go body just loops Scrape per URL (api.go:58-75),
while on Spark parallelism IS the execution model, so both methods run
the same distributed job.

The collect() to list[dict] is the API's contract (the reference hands
back materialized records); pipelines that should stay distributed use
`run_scrape_job` / the operator modules directly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# Re-export the config types like api.go:12-17
from .extract.config import (  # noqa: F401
    FieldConfig,
    PaginationConfig,
    ScraperConfig,
    load_config,
)
from .run import run_scrape_job


class ScraperClient:
    """High-level interface for scraping (api.go:20-23)."""

    def __init__(self, config: str | dict | ScraperConfig):
        self.config = (config if isinstance(config, ScraperConfig)
                       else load_config(config))
        self._metrics_enabled = False
        self.last_stats: list[dict] | None = None

    def scrape(self, spark: SparkSession, pages: DataFrame,
               **job_kwargs) -> list[dict]:
        """Run the scraping operation and return materialized records
        (api.go:32-56). Raises when the config yields no URLs, like the
        Go client's "no URLs to scrape" error."""
        if not self._urls_to_scrape():
            raise ValueError("no URLs to scrape")
        df, stats = run_scrape_job(spark, self.config, pages, **job_kwargs)
        self.last_stats = stats if self._metrics_enabled else None
        return [r.asDict(recursive=True) for r in df.collect()]

    def scrape_parallel(self, spark: SparkSession, pages: DataFrame,
                        **job_kwargs) -> list[dict]:
        """Parallel scraping across URLs (api.go:58-75). The engine is
        already partition-parallel over every URL, so this is the same
        job; the method mirrors the public surface."""
        return self.scrape(spark, pages, **job_kwargs)

    def enable_metrics(self, enabled: bool) -> None:
        """Toggle metrics collection (api.go:77-81). The Go client flips
        config.Output.EnableMetrics; this config has no such field, so
        the client gates whether `last_stats` retains the per-round crawl
        stats after scrape()."""
        self._metrics_enabled = bool(enabled)

    def _urls_to_scrape(self) -> list[str]:
        """`urls` wins over `base_url` (api.go:83-91)."""
        if self.config.urls:
            return list(self.config.urls)
        if self.config.base_url:
            return [self.config.base_url]
        return []
