"""datascrapexter_spark — a from-scratch PySpark-native analytics/crawl engine
with the query and data-processing capabilities of valpere/DataScrapexter.

Reference (read-only, studied for WHAT to compute, not HOW):
  /root/reference  (Go, ~33k LoC)

Design: everything is declared through the DataFrame/SQL API so Catalyst +
Tungsten pick the physical strategy. Python only appears in Arrow-batched
pandas UDFs for the things Spark genuinely cannot express (HTML parsing,
byte-exact Go-parity string ops); never row-at-a-time.

Layout:
  functions/   pure-Python parity core (URL canon, text norm, transforms,
               xxhash64) + their Column/pandas-UDF wrappers
  html/        stdlib HTML DOM + CSS selector engine (no lxml in sandbox)
  extract/     config-driven field extraction engine (the reference "query")
  frontier/    URL frontier: canonicalize, Bloom+anti-join dedup, robots,
               politeness budgets, crawl-round scheduler, snapshot state
  ops/         training-data-pipeline operators (dedup family, ANN,
               text analysis, multimodal plumbing)
  sources/     readers/writers (json/csv/parquet sinks, pages table)
"""

__version__ = "0.1.0"
