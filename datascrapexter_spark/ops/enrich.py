"""First-class data-enrichment operator.

Reference: /root/reference/internal/pipeline/components.go:266-316
(DataEnricher: copy the record, then each configured Enricher merges its
key/values into the map, sequentially; the parallel path is a documented
stub falling back to sequential). Relationally that is a LEFT JOIN per
enricher against a lookup source, applied in sequence — `enrich` is one
such step and chains naturally for multi-enricher configs.

Column-merge semantics when the source carries a column the record already
has: the reference's map write lets the enricher overwrite the key, so
`overwrite=True` takes the source value where it is non-null; the default
`overwrite=False` is fill-only (keeps the record's non-null values) — the
safer default for joining reference data onto scraped rows.

Scale: lookup sources are usually dimension-sized -> `broadcast=True`
pins a broadcast hash join (zero shuffle of the big side);
`broadcast="auto"` (default) leaves the choice to Catalyst/AQE, which
picks broadcast under spark.sql.autoBroadcastJoinThreshold anyway.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich(
    df: DataFrame,
    source: DataFrame,
    on: str | list[str],
    how: str = "left",
    broadcast: bool | str = "auto",
    overwrite: bool = False,
    prefix: str = "",
) -> DataFrame:
    """Merge `source`'s non-key columns onto `df` by key.

    on        join key column name(s), present in both sides
    how       join type (reference enrichment never drops records -> left)
    broadcast True pins a broadcast join; "auto" lets AQE decide
    overwrite True -> source value wins where non-null; False -> fill-only
    prefix    optional prefix for added columns (avoids collisions wholesale)
    """
    keys = [on] if isinstance(on, str) else list(on)
    for k in keys:
        if k not in df.columns or k not in source.columns:
            raise ValueError(f"enrichment key {k!r} must exist on both sides")

    add_cols = [c for c in source.columns if c not in keys]
    src = source.select(
        *keys, *[F.col(c).alias(f"_enr_{c}") for c in add_cols]
    )
    if broadcast is True:
        src = F.broadcast(src)
    joined = df.join(src, keys, how)

    out = []
    for c in df.columns:
        if c in keys or c not in add_cols:
            out.append(F.col(c))
        elif overwrite:
            out.append(F.coalesce(F.col(f"_enr_{c}"), F.col(c)).alias(c))
        else:
            out.append(F.coalesce(F.col(c), F.col(f"_enr_{c}")).alias(c))
    for c in add_cols:
        if c not in df.columns:
            out.append(F.col(f"_enr_{c}").alias(f"{prefix}{c}"))
    return joined.select(out)
