"""Database sinks: SQLite (stdlib sqlite3) + JDBC/PostgreSQL dispatch.

Reference: /root/reference/internal/output/sqlite.go (CREATE TABLE IF NOT
EXISTS with id INTEGER PRIMARY KEY AUTOINCREMENT + created_at DATETIME
DEFAULT CURRENT_TIMESTAMP, sqlite.go:199-205; conflict strategies
INSERT OR IGNORE / OR REPLACE / plain INSERT, :354-373; batch 1000 inside
one transaction per batch, :300-323) and postgresql.go (ON CONFLICT DO
NOTHING for ignore, :339-341); defaults table=scraped_data batch=1000
on_conflict=ignore (manager.go:82-109); conflict enum types.go:36-44
(replace is SQLite-only).

Spark-first split:
  * SQLite is a single local file by nature, exactly like the reference's
    whole-file writer — rows stream to the driver via toLocalIterator
    (bounded memory) and insert in batched transactions. Complex columns
    (array/struct/map) are serialized to JSON strings first, mirroring the
    reference's convertValue JSON fallback (sqlite.go:420-437).
  * PostgreSQL goes through Spark's distributed JDBC writer
    (df.write.jdbc, batchsize=1000). on_conflict="error" maps directly to
    the default INSERT path; "ignore"/"replace" need an upsert the JDBC
    writer cannot express, so `conflict_insert_sql` generates the exact
    statement (unit-tested) for the caller to run against a staging table
    — this sandbox has no JDBC driver jar or server, so that path is
    generated-and-tested but not executed here.

Column types are inferred from the DataFrame schema (the reference infers
from a 100-row sample, sqlite.go:217-298 — a schema is strictly better
information), overridable per column like the reference's ColumnTypes.
"""

from __future__ import annotations

import json
import sqlite3

from pyspark.sql import DataFrame
from pyspark.sql import types as T

DEFAULT_TABLE = "scraped_data"          # manager.go:85
DEFAULT_BATCH_SIZE = 1000               # manager.go:93
VALID_CONFLICT = ("ignore", "error", "replace")  # types.go:36-44


def quote_ident(name: str) -> str:
    """Double-quote identifier (sqlite.go quoteIdentifier, :404-409)."""
    return '"' + name.replace('"', '""') + '"'


def _sql_type(dt: T.DataType, dialect: str) -> str:
    """Spark type -> column type (sqlite.go:270-297 inference targets)."""
    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType,
                       T.BooleanType)):
        return "INTEGER" if dialect == "sqlite" else "BIGINT"
    if isinstance(dt, (T.FloatType, T.DoubleType, T.DecimalType)):
        return "REAL" if dialect == "sqlite" else "DOUBLE PRECISION"
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType, T.DateType)):
        return "DATETIME" if dialect == "sqlite" else "TIMESTAMP"
    return "TEXT"


def column_types(schema: T.StructType, dialect: str = "sqlite",
                 overrides: dict[str, str] | None = None) -> list[tuple[str, str]]:
    overrides = overrides or {}
    return [(f.name, overrides.get(f.name, _sql_type(f.dataType, dialect)))
            for f in schema.fields]


def create_table_sql(table: str, schema: T.StructType,
                     dialect: str = "sqlite",
                     overrides: dict[str, str] | None = None,
                     pg_schema: str = "public",
                     system_cols: bool = True) -> str:
    """CREATE TABLE IF NOT EXISTS with the reference's system columns
    (sqlite.go:196-205 / postgresql.go:152-163). `system_cols=False` emits
    a bare staging-table shape (exactly the DataFrame's columns)."""
    names = {f.name for f in schema.fields}
    defs = ["\t" + f"{quote_ident(c)} {t}"
            for c, t in column_types(schema, dialect, overrides)]
    # system columns (id autoincrement + created_at) are added only when
    # the data doesn't already carry a column of that name
    if dialect == "sqlite":
        head = f"CREATE TABLE IF NOT EXISTS {quote_ident(table)} (\n"
        if system_cols and "id" not in names:
            defs = ["\tid INTEGER PRIMARY KEY AUTOINCREMENT"] + defs
        if system_cols and "created_at" not in names:
            defs = defs + ["\tcreated_at DATETIME DEFAULT CURRENT_TIMESTAMP"]
    else:
        head = (f"CREATE TABLE IF NOT EXISTS "
                f"{quote_ident(pg_schema)}.{quote_ident(table)} (\n")
        if system_cols and "id" not in names:
            defs = ["\tid BIGSERIAL PRIMARY KEY"] + defs
        if system_cols and "created_at" not in names:
            defs = defs + ["\tcreated_at TIMESTAMP DEFAULT CURRENT_TIMESTAMP"]
    return head + ",\n".join(defs) + "\n);"


def conflict_insert_sql(table: str, columns: list[str],
                        on_conflict: str = "ignore",
                        dialect: str = "sqlite",
                        pg_schema: str = "public") -> str:
    """The conflict-strategy INSERT (sqlite.go:354-373 /
    postgresql.go:330-355). `replace` is SQLite-only (types.go:42-44)."""
    if on_conflict not in VALID_CONFLICT:
        raise ValueError(f"invalid conflict strategy: {on_conflict!r} "
                         f"(valid: {VALID_CONFLICT})")
    cols = ", ".join(quote_ident(c) for c in columns)
    if dialect == "sqlite":
        ph = ", ".join("?" for _ in columns)
        verb = {"ignore": "INSERT OR IGNORE",
                "replace": "INSERT OR REPLACE",
                "error": "INSERT"}[on_conflict]
        return f"{verb} INTO {quote_ident(table)} ({cols}) VALUES ({ph})"
    if on_conflict == "replace":
        raise ValueError("conflict strategy 'replace' is SQLite-only "
                         "(types.go:42-44)")
    ph = ", ".join("%s" for _ in columns)
    tail = " ON CONFLICT DO NOTHING" if on_conflict == "ignore" else ""
    return (f"INSERT INTO {quote_ident(pg_schema)}.{quote_ident(table)} "
            f"({cols}) VALUES ({ph}){tail}")


def conflict_apply_sql(table: str, columns: list[str],
                       on_conflict: str = "ignore",
                       dialect: str = "sqlite",
                       pg_schema: str = "public",
                       staging_table: str | None = None) -> str:
    """The database-side half of the distributed upsert: INSERT ... SELECT
    from the staging table with the conflict clause (the reference's
    per-row statements, sqlite.go:354-373 / postgresql.go:330-355, applied
    set-wise over a staged batch). The distributed writer lands rows in
    `{table}_staging` (plain INSERT — expressible by any bulk loader);
    this one statement then applies them under ignore/replace/error
    semantics atomically."""
    if on_conflict not in VALID_CONFLICT:
        raise ValueError(f"invalid conflict strategy: {on_conflict!r} "
                         f"(valid: {VALID_CONFLICT})")
    staging = staging_table or f"{table}_staging"
    cols = ", ".join(quote_ident(c) for c in columns)
    if dialect == "sqlite":
        verb = {"ignore": "INSERT OR IGNORE",
                "replace": "INSERT OR REPLACE",
                "error": "INSERT"}[on_conflict]
        return (f"{verb} INTO {quote_ident(table)} ({cols}) "
                f"SELECT {cols} FROM {quote_ident(staging)}")
    if on_conflict == "replace":
        raise ValueError("conflict strategy 'replace' is SQLite-only "
                         "(types.go:42-44)")
    tail = " ON CONFLICT DO NOTHING" if on_conflict == "ignore" else ""
    return (f"INSERT INTO {quote_ident(pg_schema)}.{quote_ident(table)} "
            f"({cols}) SELECT {cols} FROM "
            f"{quote_ident(pg_schema)}.{quote_ident(staging)}{tail}")


def _json_safe_rows(df: DataFrame) -> DataFrame:
    """Serialize nested columns to JSON strings (convertValue parity)."""
    from .sinks import csv_safe

    return csv_safe(df)


def write_sqlite(df: DataFrame, path: str, table: str = DEFAULT_TABLE,
                 batch_size: int = DEFAULT_BATCH_SIZE,
                 on_conflict: str = "ignore",
                 column_type_overrides: dict[str, str] | None = None) -> int:
    """Write a DataFrame into a SQLite database file; returns rows written.

    Driver-side by design — a SQLite file is a single local artifact, the
    same shape as the reference's writer; rows stream via toLocalIterator
    so only one partition is resident. Batches of `batch_size` run inside
    one transaction each (sqlite.go:300-323).
    """
    flat = _json_safe_rows(df)
    cols = [f.name for f in flat.schema.fields]
    ddl = create_table_sql(table, flat.schema, "sqlite",
                           column_type_overrides)
    ins = conflict_insert_sql(table, cols, on_conflict, "sqlite")

    con = sqlite3.connect(path)
    try:
        con.execute(ddl)
        con.commit()
        return _stream_insert(con, ins, flat, cols, batch_size)
    finally:
        con.close()


def _to_cell(v):
    if isinstance(v, bool):  # before int: bool is an int subclass
        return int(v)
    if v is None or isinstance(v, (int, float, str, bytes)):
        return v
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return json.dumps(v, sort_keys=True)


def _stream_insert(con, ins: str, flat: DataFrame, cols: list[str],
                   batch_size: int) -> int:
    """Stream rows driver-side in batched transactions (sqlite.go:300-323);
    toLocalIterator keeps one partition resident."""
    n = 0
    batch: list[tuple] = []
    for row in flat.toLocalIterator():
        batch.append(tuple(_to_cell(row[c]) for c in cols))
        if len(batch) >= batch_size:
            with con:  # one transaction per batch
                con.executemany(ins, batch)
            n += len(batch)
            batch = []
    if batch:
        with con:
            con.executemany(ins, batch)
        n += len(batch)
    return n


def upsert_via_staging(df: DataFrame, path: str, table: str = DEFAULT_TABLE,
                       batch_size: int = DEFAULT_BATCH_SIZE,
                       on_conflict: str = "ignore",
                       column_type_overrides: dict[str, str] | None = None,
                       ) -> int:
    """Executable end-to-end staging upsert (the contract write_jdbc
    documents for PostgreSQL, proven here with SQLite playing the database
    side): (1) land rows in `{table}_staging` via plain INSERT — the only
    statement a distributed bulk writer needs; (2) apply them to the
    target with ONE conflict_apply_sql statement, atomically; (3) drop the
    staging table. Conflict semantics come from the target's own UNIQUE
    constraints, exactly as in the reference (sqlite.go:354-373 relies on
    the table's indexes). Returns rows applied (ignored duplicates don't
    count)."""
    flat = _json_safe_rows(df)
    cols = [f.name for f in flat.schema.fields]
    staging = f"{table}_staging"
    con = sqlite3.connect(path)
    try:
        con.execute(create_table_sql(table, flat.schema, "sqlite",
                                     column_type_overrides))
        con.execute(f"DROP TABLE IF EXISTS {quote_ident(staging)}")
        con.execute(create_table_sql(staging, flat.schema, "sqlite",
                                     column_type_overrides,
                                     system_cols=False))
        con.commit()
        _stream_insert(
            con, conflict_insert_sql(staging, cols, "error", "sqlite"),
            flat, cols, batch_size)
        before = con.total_changes
        with con:  # apply + drop in one transaction
            con.execute(conflict_apply_sql(table, cols, on_conflict,
                                           "sqlite"))
            applied = con.total_changes - before
            con.execute(f"DROP TABLE {quote_ident(staging)}")
        return applied
    finally:
        con.close()


def write_jdbc(df: DataFrame, url: str, table: str = DEFAULT_TABLE,
               batch_size: int = DEFAULT_BATCH_SIZE,
               on_conflict: str = "error", mode: str = "append",
               properties: dict[str, str] | None = None,
               apply_fn=None, pg_schema: str = "public") -> None:
    """Distributed JDBC write (the PostgreSQL sink's scale path).

    on_conflict="error" is the plain INSERT the JDBC writer performs
    natively. "ignore"/"replace" need the staging flow: this writer lands
    the rows in `{table}_staging` and the database applies them with ONE
    `conflict_apply_sql(..., dialect='postgresql')` statement — the exact
    flow `upsert_via_staging` executes end-to-end against SQLite in the
    test suite. Pass `apply_fn(sql)` (a callable that runs a statement on
    the database — e.g. a psycopg cursor.execute) to complete the upsert;
    without one this function refuses rather than silently downgrading
    the conflict semantics.
    """
    if on_conflict not in VALID_CONFLICT:
        raise ValueError(f"invalid conflict strategy: {on_conflict!r}")
    flat = _json_safe_rows(df)
    if on_conflict == "error":
        (
            flat.write.mode(mode)
            .option("batchsize", str(batch_size))
            .jdbc(url, table, properties=properties or {})
        )
        return
    if apply_fn is None:
        raise NotImplementedError(
            f"on_conflict={on_conflict!r} needs a database-side upsert: "
            f"pass apply_fn to run conflict_apply_sql against the server "
            f"(the staging contract exercised end-to-end by "
            f"upsert_via_staging in test_sinks)")
    cols = [f.name for f in flat.schema.fields]
    staging = f"{table}_staging"
    # stage into the SAME schema the apply statement reads from — an
    # unqualified JDBC write lands wherever the connection's search_path
    # points, which breaks the apply under a non-default search_path
    (
        flat.write.mode("overwrite")
        .option("batchsize", str(batch_size))
        .jdbc(url, f"{quote_ident(pg_schema)}.{quote_ident(staging)}",
              properties=properties or {})
    )
    apply_fn(conflict_apply_sql(table, cols, on_conflict, "postgresql",
                                pg_schema=pg_schema))
    apply_fn(f"DROP TABLE {quote_ident(pg_schema)}.{quote_ident(staging)}")
