"""Spark surface of the extraction engine.

The reference processes one page per goroutine (engine.go:306-402,
pipeline.go:225-304); here a whole crawl round's pages are one DataFrame and
extraction is a single `mapInPandas` pass: each Arrow batch is parsed and
extracted in one Python call (input_hint: vectorized pandas/Arrow UDFs, no
per-row Python crossings).

Scale notes:
- `html` is the fat column. Catalyst prunes it everywhere except this one
  projection, and the UDF drops it on output unless asked to keep it —
  downstream stages (dedup, scheduling) never shuffle page bodies.
- The UDF is schema-stable: output StructType is derived from the field
  config at plan time (config-declared schema, like the reference's YAML
  fields list — config.go:35 — but statically typed).
"""

from __future__ import annotations

import json as _json
from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..html import parse_html
from .config import FieldConfig
from .fields import extract_all, get_default_value

_SPARK_TYPE_BY_FIELD_TYPE: dict[str, T.DataType] = {
    "text": T.StringType(),
    "html": T.StringType(),
    "main_content": T.StringType(),
    "attr": T.StringType(),
    "url": T.StringType(),
    "email": T.StringType(),
    "phone": T.StringType(),
    "date": T.StringType(),
    "datetime": T.StringType(),
    "time": T.StringType(),
    "list": T.ArrayType(T.StringType()),
    "number": T.DoubleType(),
    "float": T.DoubleType(),
    "integer": T.LongType(),
    "count": T.IntegerType(),
    "boolean": T.BooleanType(),
    "exists": T.BooleanType(),
    "json": T.StringType(),  # canonical JSON dump of the parsed tree
    "jsonld": T.StringType(),  # canonical JSON dump of the parsed graph(s)
    "microdata": T.StringType(),  # canonical JSON dump of the item tree(s)
    "rdfa": T.StringType(),  # canonical JSON dump of the item tree(s)
    "social_meta": T.StringType(),  # canonical JSON dump of the og:/twitter: map
    "media": T.ArrayType(T.MapType(T.StringType(), T.StringType())),
    "outline": T.ArrayType(T.MapType(T.StringType(), T.StringType())),
    "csv": T.ArrayType(T.ArrayType(T.StringType())),
    "table": T.StructType([
        T.StructField("headers", T.ArrayType(T.StringType())),
        T.StructField("rows", T.ArrayType(T.MapType(T.StringType(), T.StringType()))),
        T.StructField("count", T.IntegerType()),
    ]),
}

ERROR_FIELD = T.StructField(
    "_errors",
    T.ArrayType(T.StructType([
        T.StructField("field", T.StringType()),
        T.StructField("message", T.StringType()),
        T.StructField("code", T.StringType()),
        T.StructField("severity", T.StringType()),
    ])),
)
SUCCESS_FIELD = T.StructField("_success", T.BooleanType())


def field_spark_type(cfg: FieldConfig) -> T.DataType:
    # transforms stringify the value (extractor.go:84-90)
    if cfg.transform:
        return T.StringType()
    return _SPARK_TYPE_BY_FIELD_TYPE[cfg.type]


def extraction_output_schema(
    input_schema: T.StructType,
    fields: list[FieldConfig],
    keep_html: bool = False,
    html_col: str = "html",
) -> T.StructType:
    out = [f for f in input_schema.fields if keep_html or f.name != html_col]
    out.extend(T.StructField(cfg.name, field_spark_type(cfg)) for cfg in fields)
    out.append(ERROR_FIELD)
    out.append(SUCCESS_FIELD)
    return T.StructType(out)


def _to_cell(cfg: FieldConfig, value: Any):
    """Convert the extracted Python value to its Arrow-compatible cell."""
    if value is None:
        return None
    if cfg.transform:
        return value if isinstance(value, str) else str(value)
    t = cfg.type
    if t in ("json", "jsonld", "microdata", "rdfa", "social_meta"):
        return _json.dumps(value, separators=(",", ":"), sort_keys=True)
    if t in ("media", "outline"):
        return list(value)
    if t in ("number", "float"):
        return float(value)
    if t == "integer":
        return int(value)
    if t == "count":
        return int(value)
    if t == "table":
        if not isinstance(value, dict) or "headers" not in value:
            return None
        return (value.get("headers", []), value.get("rows", []),
                value.get("count", 0))
    if t in ("list", "csv"):
        return list(value) if not isinstance(value, dict) else []
    if t in ("text", "html", "attr", "url", "email", "phone", "date",
             "datetime", "time"):
        return value if isinstance(value, str) else str(value)
    return value


def extract_fields_df(
    df: DataFrame,
    fields: list[FieldConfig],
    html_col: str = "html",
    continue_on_error: bool = True,
    keep_html: bool = False,
) -> DataFrame:
    """Run config-driven extraction over `df[html_col]` (binary or string).

    Adds one typed column per field plus `_errors` / `_success`; drops the
    html column by default so downstream shuffles stay narrow.
    """
    for cfg in fields:
        cfg.validate()
    out_schema = extraction_output_schema(df.schema, fields, keep_html, html_col)
    out_names = [f.name for f in out_schema.fields]
    fields_local = fields  # close over plain dataclasses (picklable)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            cols: dict[str, list] = {cfg.name: [None] * n for cfg in fields_local}
            errs, succ = [None] * n, [True] * n
            htmls = pdf[html_col]
            for i in range(n):
                doc = parse_html(htmls.iloc[i] or "")
                data, errors, success = extract_all(
                    doc, fields_local, continue_on_error
                )
                for cfg in fields_local:
                    if cfg.name in data:
                        cols[cfg.name][i] = _to_cell(cfg, data[cfg.name])
                    elif not cfg.required:
                        cols[cfg.name][i] = _to_cell(cfg, get_default_value(cfg))
                errs[i] = [
                    (e.field_name, e.message, e.code, e.severity)
                    for e in errors
                ]
                succ[i] = success
            out = {}
            for name in out_names:
                if name in cols:
                    out[name] = cols[name]
                elif name == "_errors":
                    out[name] = errs
                elif name == "_success":
                    out[name] = succ
                else:
                    out[name] = pdf[name]
            yield pd.DataFrame(out, columns=out_names)

    return df.mapInPandas(run, schema=out_schema)


def extraction_metrics(results: DataFrame,
                       fields: list[FieldConfig]) -> DataFrame:
    """Per-field extraction success/error rates over an extract_fields_df
    result — the RecordExtractionSuccess / RecordExtractionError counter
    family (internal/monitoring/metrics.go:650-661) as one codegen
    aggregation pass (no Python, no shuffle beyond the final global agg).

    Returns (field, n_rows, n_success, n_error, error_rate): a field counts
    as an error on a row when `_errors` holds an ERROR/CRITICAL entry for
    it (warnings don't fail extraction — extractor.go:126-140)."""
    def _has_err(name: str):
        return F.exists(
            "_errors",
            lambda e: (e["field"] == name)
            & F.upper(e["severity"]).isin("ERROR", "CRITICAL"),
        )

    # coalesce: F.sum over zero rows is NULL — empty crawls report 0s
    aggs = [F.coalesce(F.sum(_has_err(cfg.name).cast("long")),
                       F.lit(0)).alias(cfg.name)
            for cfg in fields]
    counted = results.agg(F.count("*").alias("_n"), *aggs)
    per_field = F.explode(F.array(*[
        F.struct(
            F.lit(cfg.name).alias("field"),
            F.col(cfg.name).alias("n_error"),
        )
        for cfg in fields
    ])).alias("m")
    return (
        counted.select(F.col("_n"), per_field)
        .select(
            F.col("m.field").alias("field"),
            F.col("_n").alias("n_rows"),
            (F.col("_n") - F.col("m.n_error")).alias("n_success"),
            F.col("m.n_error").alias("n_error"),
            F.when(F.col("_n") > 0,
                   F.col("m.n_error") / F.col("_n"))
            .otherwise(F.lit(0.0)).alias("error_rate"),
        )
    )
