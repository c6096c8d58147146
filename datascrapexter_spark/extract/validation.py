"""Validation rules + error-threshold predicates, Spark-first.

Reference:
  DataValidator.Validate        /root/reference/internal/pipeline/
                                components.go:86-126 (strict mode fails the
                                record; non-strict substitutes Default or
                                drops the field)
  DataValidator.validateField   components.go:129-170 (string min/max byte
                                length + options whitelist; number/boolean
                                type checks)
  Engine.checkErrorThresholds   /root/reference/internal/scraper/
                                engine.go:1021-1045 (stop when batch errors
                                >= N or overall error rate >= p%)

Spark mapping: every rule compiles to Column expressions (codegen; zero
Python). Row-shaped semantics become column-shaped:
  strict mode     -> rows failing any rule are filtered out (the record
                     "fails"); `split_valid` returns both sides so the
                     failure side can be quarantined, not lost
  non-strict mode -> invalid field value replaced by `default` (or NULL =
                     "delete the field"); a `_violations` array column
                     records what happened (the error side-channel)
The threshold check is a cheap driver-side agg between crawl rounds, same
place the reference checks between batches.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


@dataclass
class ValidationRule:
    field: str
    type: str = "string"           # string | number | boolean
    required: bool = False
    min_length: int = 0            # byte length, like Go len(str)
    max_length: int = 0
    options: list[str] = field(default_factory=list)
    default: object = None


def _violation(rule: ValidationRule, col: Column) -> Column:
    """NULL when valid; reason string when the rule is violated.
    Missing (NULL) fields violate only `required` rules."""
    checks: list[tuple[Column, str]] = []
    if rule.required:
        checks.append((col.isNull(), f"required field {rule.field} is missing"))
    if rule.type == "string":
        blen = F.octet_length(col)
        if rule.min_length > 0:
            checks.append((col.isNotNull() & (blen < rule.min_length),
                           f"{rule.field}: string too short"))
        if rule.max_length > 0:
            checks.append((col.isNotNull() & (blen > rule.max_length),
                           f"{rule.field}: string too long"))
        if rule.options:
            allowed = F.array(*[F.lit(o) for o in rule.options])
            checks.append((col.isNotNull() & ~F.array_contains(allowed, col),
                           f"{rule.field}: value not in allowed options"))
    elif rule.type == "number":
        checks.append((col.isNotNull() & col.try_cast("double").isNull(),
                       f"{rule.field}: expected number"))
    elif rule.type == "boolean":
        checks.append((col.isNotNull() & col.try_cast("boolean").isNull(),
                       f"{rule.field}: expected boolean"))
    else:
        raise ValueError(f"unknown validation type: {rule.type}")

    out = F.lit(None).cast("string")
    for cond, msg in reversed(checks):
        out = F.when(cond, F.lit(msg)).otherwise(out)
    return out


def validate_df(df: DataFrame, rules: list[ValidationRule],
                strict: bool = False) -> DataFrame:
    """Apply validation rules; adds `_violations` array<string>.

    strict=True  -> rows with any violation are dropped (Validate's error
                    return). Use `split_valid` to keep the rejects.
    strict=False -> invalid field -> rule.default (or NULL), violation
                    recorded (Default-substitute / delete-field semantics).
    """
    viols = []
    out = df
    for i, rule in enumerate(rules):
        vcol = f"_v{i}"
        out = out.withColumn(vcol, _violation(rule, F.col(rule.field)))
        viols.append(vcol)
        if not strict:
            replacement = (F.lit(rule.default) if rule.default is not None
                           else F.lit(None))
            # required-missing keeps default substitution; other violations
            # replace with default/NULL (components.go:116-122)
            out = out.withColumn(
                rule.field,
                F.when(F.col(vcol).isNotNull(),
                       replacement.cast(df.schema[rule.field].dataType))
                .otherwise(F.col(rule.field)),
            )
    arr = F.array_compact(F.array(*[F.col(v) for v in viols]))
    out = out.withColumn("_violations", arr).drop(*viols)
    if strict:
        out = out.filter(F.size("_violations") == 0)
    return out


def split_valid(df: DataFrame, rules: list[ValidationRule]
                ) -> tuple[DataFrame, DataFrame]:
    """(valid, rejected) under strict semantics, rejects keep _violations."""
    checked = validate_df(df, rules, strict=False)
    return (checked.filter(F.size("_violations") == 0),
            checked.filter(F.size("_violations") > 0))


def error_counts(df: DataFrame, error_col: str = "_success") -> tuple[int, int]:
    """(errors, total) in one cheap agg — the between-rounds check input."""
    row = df.agg(
        F.count("*").alias("total"),
        F.sum(F.when(~F.col(error_col), 1).otherwise(0)).alias("errors"),
    ).collect()[0]
    return int(row["errors"] or 0), int(row["total"] or 0)


def should_stop(batch_errors: int, total_errors: int, total_processed: int,
                stop_on_error_threshold: bool = False,
                error_threshold: int = 0,
                error_threshold_percent: float = 0.0) -> bool:
    """checkErrorThresholds parity (engine.go:1021-1045)."""
    if not stop_on_error_threshold:
        return False
    if error_threshold > 0 and batch_errors >= error_threshold:
        return True
    if error_threshold_percent > 0 and total_processed > 0:
        rate = total_errors / total_processed * 100.0
        if rate >= error_threshold_percent:
            return True
    return False
