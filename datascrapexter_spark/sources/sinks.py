"""Output sinks with the reference's format dispatch.

Reference: /root/reference/internal/output/manager.go:50-79 (format ->
writer dispatch over the enum at internal/output/types.go:12-24: json, csv,
xml, yaml, excel, parquet, postgresql, sqlite; stdout default).

Spark-first mapping — every format that has a distributed writer uses it;
driver-side materialization only where the format is inherently
single-file-small (yaml), mirroring the reference's whole-file writers:

  json     df.write.json            (json.go:28-39 writes an array; we write
                                     JSONL — the distributed-friendly form —
                                     plus to_json_array() for byte-parity)
  csv      df.write.csv(header)     (csv.go:35-79 header+rows)
  parquet  df.write.parquet         (declared at output/types.go:21; archive
                                     config configs/news-media.yaml:320-325
                                     adds snappy + partition_by)
  xml      executor-rendered record fragments + driver root wrapper
                                    (xml.go whole-file; see xmlsink.py)
  sqlite   stdlib sqlite3, batched transactions + conflict strategies
                                    (sqlite.go; see dbsinks.py)
  jdbc / postgresql
           df.write.jdbc(batchsize) (postgresql.go; options["url"] required;
                                     see dbsinks.write_jdbc for the conflict-
                                     strategy contract)
  yaml     driver-side dump          (yaml.go whole-file)
  stdout   df.show                   (manager.go default)
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SUPPORTED_FORMATS = ("json", "jsonl", "csv", "parquet", "stdout", "yaml",
                     "xml", "sqlite", "jdbc", "postgresql", "excel", "xlsx",
                     "warc", "warc.gz")


def write_output(
    df: DataFrame,
    fmt: str,
    path: str | None = None,
    partition_by: list[str] | None = None,
    compression: str | None = None,
    mode: str = "overwrite",
    options: dict | None = None,
) -> None:
    """Format-dispatch writer (OutputManager.WriteResults parity).
    `options` carries format-specific settings: table / batch_size /
    on_conflict (sqlite, jdbc), url / properties (jdbc), root_element /
    record_element (xml)."""
    fmt = fmt.lower()
    opts = options or {}
    if fmt == "stdout":
        df.show(truncate=False)
        return
    if fmt in ("jdbc", "postgresql"):
        from .dbsinks import write_jdbc

        url = opts.get("url")
        if not url:
            raise ValueError("jdbc output requires options['url'] "
                             "(manager.go:105-107 connection_string)")
        write_jdbc(df, url, table=opts.get("table", "scraped_data"),
                   batch_size=int(opts.get("batch_size", 1000)),
                   on_conflict=opts.get("on_conflict", "error"),
                   mode=opts.get("mode", "append"),
                   properties=opts.get("properties"))
        return
    if path is None:
        raise ValueError(f"format {fmt!r} requires a path")
    if fmt in ("warc", "warc.gz"):
        from .warc import write_warc

        write_warc(df, path,
                   url_col=opts.get("url_col", "url"),
                   ts_col=opts.get("ts_col"),
                   payload_col=opts.get("payload_col", "html"),
                   num_files=opts.get("num_files"),
                   compress=(fmt == "warc.gz"
                             or bool(opts.get("compress", True))))
        return
    if fmt == "sqlite":
        from .dbsinks import write_sqlite

        write_sqlite(df, path, table=opts.get("table", "scraped_data"),
                     batch_size=int(opts.get("batch_size", 1000)),
                     on_conflict=opts.get("on_conflict", "ignore"))
        return
    if fmt in ("excel", "xlsx"):
        from .excelsink import write_excel

        write_excel(df, path,
                    sheet_name=opts.get("sheet_name", "Sheet1"),
                    include_headers=bool(opts.get("include_headers", True)))
        return
    if fmt == "xml":
        from .xmlsink import write_xml

        write_xml(df, path,
                  root_element=opts.get("root_element", "data"),
                  record_element=opts.get("record_element", "record"))
        return
    if fmt in ("json", "jsonl"):
        w = df.write.mode(mode)
        if compression:
            w = w.option("compression", compression)
        w.json(path)
        return
    if fmt == "csv":
        w = csv_safe(df).write.mode(mode).option("header", "true")
        if compression:
            w = w.option("compression", compression)
        w.csv(path)
        return
    if fmt == "parquet":
        w = df.write.mode(mode)
        if compression:
            w = w.option("compression", compression)
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(path)
        return
    if fmt == "yaml":
        _write_yaml_driver_side(df, path)
        return
    raise ValueError(
        f"unsupported output format: {fmt!r} (supported: {SUPPORTED_FORMATS})"
    )


def csv_safe(df: DataFrame) -> DataFrame:
    """CSV cannot carry nested types; serialize array/struct/map columns to
    JSON strings (the reference's CSV writer stringifies complex values,
    csv.go:59-74)."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    cols = []
    for f in df.schema.fields:
        if isinstance(f.dataType, (ArrayType, MapType, StructType)):
            cols.append(F.to_json(F.col(f.name)).alias(f.name))
        else:
            cols.append(F.col(f.name))
    return df.select(cols)


def to_json_array(df: DataFrame) -> str:
    """Byte-parity helper for the reference's pretty JSON array sink
    (json.go:28-39: MarshalIndent with 2-space indent). Driver-side —
    only for small result sets / golden comparisons."""
    rows = [json.loads(r) for r in df.toJSON().collect()]
    return json.dumps(rows, indent=2, sort_keys=True)


def _write_yaml_driver_side(df: DataFrame, path: str) -> None:
    """YAML whole-file sink (yaml.go parity). Gated import: PyYAML may be
    absent; fall back to a JSON-compatible dump (JSON is valid YAML)."""
    rows = [json.loads(r) for r in df.toJSON().collect()]
    try:
        import yaml  # type: ignore

        text = yaml.safe_dump(rows, sort_keys=True)
    except ImportError:
        text = json.dumps(rows, indent=2, sort_keys=True)
    with open(path, "w", encoding="utf-8") as f:
        f.write(text)


def add_scrape_metadata(df: DataFrame, source_url_col: str = "url") -> DataFrame:
    """The reference attaches ScrapingMetadata per result
    (internal/scraper/types.go:104-115); here it is one struct column."""
    return df.withColumn(
        "metadata",
        F.struct(
            F.col(source_url_col).alias("source_url"),
            F.current_timestamp().alias("scraped_at"),
            F.spark_partition_id().alias("partition_id"),
        ),
    )
