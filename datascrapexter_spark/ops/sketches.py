"""Deterministic cardinality sketches (HyperLogLog registers).

A 10^10-URL frontier needs cheap distinct counts everywhere — distinct
URLs per host, per round, per sitemap — where exact countDistinct means
a full shuffle of the key set. HyperLogLog reduces each group to 2^p
byte-sized registers that merge with elementwise max (associative,
commutative → map-side combinable, resumable across crawl rounds, and
exactly the shape of the reference's lightweight per-host counters in
internal/monitoring/metrics.go, made mergeable).

Everything about the REGISTERS is integer-exact and engine-portable:
the hash is the md5-slice rule every dedup operator here uses (60 bits
= 15 hex chars, so it stays positive in a signed BIGINT on every
engine), the register index is the top ``p`` bits, and rho is
1 + leading-zeros of the remaining ``60-p`` bits computed via binary
string length — no floats, no transcendentals, so the register table
is oracle-gated bit-for-bit (q64). Only ``hll_estimate`` (the final
driver-side readout over <= 2^p tiny rows) touches floats.

Standard error ~= 1.04 / sqrt(2^p): p=8 -> ~6.5 %, p=12 -> ~1.6 %.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_HASH_BITS = 60


def _hash60(key: Column | str, seed: int) -> Column:
    c = F.col(key) if isinstance(key, str) else key
    return F.conv(F.substring(
        F.md5(F.concat(c.cast("string"), F.lit(f"#{seed}"))), 1, 15),
        16, 10).cast("long")


def hll_registers(df: DataFrame, key_col: str, p: int = 8,
                  seed: int = 0) -> DataFrame:
    """HLL register table for the distinct count of ``key_col``.

    One row per NON-EMPTY register: (reg, max_rho). Empty registers are
    implicit zeros (``hll_estimate`` accounts for them), so the result
    is at most 2^p rows regardless of input size.

    Scale shape: hashing/register math is pure codegen in the scan
    stage; the single exchange is the groupBy(reg) whose map-side
    partial max collapses every partition to <= 2^p rows before the
    shuffle — constant traffic no matter the corpus.
    """
    if not 4 <= p <= 16:
        raise ValueError(f"p must be in [4, 16], got {p}")
    shift = _HASH_BITS - p
    h = _hash60(key_col, seed)
    reg = F.shiftright(h, shift).alias("reg")
    rem = F.pmod(h, F.lit(1 << shift))
    rho = (F.when(rem == 0, F.lit(shift + 1))
           .otherwise(F.lit(shift + 1) - F.length(F.bin(rem))))
    return (df.select(reg, rho.cast("int").alias("rho"))
            .groupBy("reg")
            .agg(F.max("rho").alias("max_rho")))


def merge_registers(*register_tables: DataFrame) -> DataFrame:
    """Merge register tables (elementwise max) — union of the sketched
    sets. Constant-size inputs and output; this is how per-round /
    per-shard sketches roll up without touching the raw keys again."""
    if not register_tables:
        raise ValueError("need at least one register table")
    out = register_tables[0]
    for t in register_tables[1:]:
        out = out.unionByName(t)
    return out.groupBy("reg").agg(F.max("max_rho").alias("max_rho"))


def hll_estimate(registers: DataFrame, p: int = 8) -> float:
    """Driver-side HLL readout (Flajolet et al. 2007, with the standard
    small-range linear-counting correction). Collects <= 2^p rows."""
    m = 1 << p
    alpha = 0.7213 / (1 + 1.079 / m)
    rows = {r["reg"]: r["max_rho"] for r in registers.collect()}
    inv_sum = sum(2.0 ** -rows.get(j, 0) for j in range(m))
    est = alpha * m * m / inv_sum
    zeros = m - len(rows)
    if est <= 2.5 * m and zeros > 0:
        est = m * math.log(m / zeros)
    return est


def exact_group_quantiles(df: DataFrame, group_col: str, value_col: str,
                          pcts: tuple[int, ...] = (50, 90, 99)
                          ) -> DataFrame:
    """EXACT per-group discrete quantiles (type-1 / lower: the smallest
    value whose cumulative frequency reaches ceil(pct*n/100)) without
    ever sorting the raw rows — the exact companion to the HLL sketch
    above, and the integrity check approximate percentile_approx
    monitoring needs a ground truth against. A corpus report quoting
    p50/p99 document lengths per language (Gopher table 1, C4 appendix)
    is this operator.

    Scale shape (100 TB in, histogram out):
    - ONE scan -> groupBy (group, value) count: the only corpus-width
      exchange, map-side combinable, output is histogram-width
      (|groups| x |distinct values|, e.g. languages x plausible doc
      lengths — thousands, not billions).
    - running sum via a window PARTITIONED BY group ordered by value —
      per-group histogram-width, never a global single-partition sort.
    - the pct cut is the exact integer comparison 100*cum >= pct*n
      (equivalent to cum >= ceil(pct*n/100) for integer cum, n; no
      float percentile, no interpolation), taken as a conditional MIN
      in the same per-group aggregate — ties and partitioning order
      cannot change the answer.

    Returns one row per group: (group_col, n, p{pct}... ) with p-cols
    in the value column's type.
    """
    from pyspark.sql import Window

    # null values are EXCLUDED by contract: Spark windows order nulls
    # first, DuckDB/ANSI last — inside the running sum that divergence
    # would silently shift every cut, so nulls don't enter the histogram
    hist = (df.select(F.col(group_col).alias("_g"),
                      F.col(value_col).alias("_v"))
            .filter(F.col("_v").isNotNull())
            .groupBy("_g", "_v").agg(F.count(F.lit(1)).alias("_c")))
    w = (Window.partitionBy("_g").orderBy("_v")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cum = hist.withColumn("_cum", F.sum("_c").over(w))
    wn = Window.partitionBy("_g")
    cum = cum.withColumn("_n", F.sum("_c").over(wn))
    aggs = [F.max("_n").cast("long").alias("n")]
    for pct in pcts:
        aggs.append(F.min(F.when(
            F.lit(100) * F.col("_cum") >= F.lit(int(pct)) * F.col("_n"),
            F.col("_v"))).alias(f"p{int(pct)}"))
    return (cum.groupBy("_g").agg(*aggs)
            .withColumnRenamed("_g", group_col))
