"""SQLite source (SURVEY §2.1 S10).

The reference copies the bakta ``ups`` reference table out of a SQLite file
into the warehouse once (`code/postgres_scripts/bakta_db.R:6-12`:
``RSQLite::dbConnect`` → ``tbl(bakta_con, "ups") |> collect() |>
dbWriteTable``). Same shape here: a one-shot driver-side copy through
Arrow into a DataFrame, then a normal warehouse write. Not a scan path —
SQLite files are single-machine artifacts; anything big lives in Parquet.
"""

from __future__ import annotations

import sqlite3

from pyspark.sql import DataFrame, SparkSession

_AFFINITY_TO_SPARK = {
    "INTEGER": "long", "INT": "long", "BIGINT": "long", "SMALLINT": "long",
    "REAL": "double", "FLOAT": "double", "DOUBLE": "double",
    "NUMERIC": "double", "BOOLEAN": "boolean", "BLOB": "binary",
}


def list_tables(db_path: str) -> list[str]:
    """``RSQLite::dbListTables`` analog (`bakta_db.R:7`)."""
    with sqlite3.connect(db_path) as con:
        rows = con.execute(
            "SELECT name FROM sqlite_master WHERE type='table' "
            "ORDER BY name").fetchall()
    return [r[0] for r in rows]


def read_sqlite(spark: SparkSession, db_path: str, table: str,
                batch_size: int = 50_000) -> DataFrame:
    """One-shot SQLite table -> DataFrame (S10, `bakta_db.R:6-12`).

    Column types come from the declared SQLite affinities; everything
    unrecognized degrades to string (SQLite is dynamically typed — the
    declared type is a hint, exactly the contract the reference accepts
    by ``collect()``-ing through R).
    """
    with sqlite3.connect(db_path) as con:
        cols = con.execute(f'PRAGMA table_info("{table}")').fetchall()
        if not cols:
            raise KeyError(f"table {table!r} not found in {db_path}")
        names = [c[1] for c in cols]
        types = [_AFFINITY_TO_SPARK.get((c[2] or "").upper().split("(")[0],
                                        "string") for c in cols]
        cur = con.execute(
            'SELECT {} FROM "{}"'.format(
                ", ".join(f'"{n}"' for n in names), table))
        data = []
        while True:
            chunk = cur.fetchmany(batch_size)
            if not chunk:
                break
            data.extend(chunk)
    schema = ", ".join(f"`{n}` {t}" for n, t in zip(names, types))

    def _coerce(v, t):
        # SQLite is dynamically typed: ANY value can sit in ANY declared
        # column (a TEXT 'N/A' in an INTEGER column is legal). Convert when
        # possible, degrade to None when not — an off-type cell must not
        # abort the whole copy with a createDataFrame TypeError.
        if v is None:
            return None
        if t == "string":
            return v if isinstance(v, str) else str(v)
        try:
            if t == "long":
                if type(v) is int:     # the common case: no conversion work
                    return v
                if isinstance(v, bytes):
                    return None
                # degrade-to-None contract: a fractional REAL in an
                # INTEGER-declared column must become null, not be
                # silently truncated by int().
                return int(v) if float(v).is_integer() else None
            if t == "double":
                return float(v) if not isinstance(v, bytes) else None
            if t == "boolean":
                return bool(int(v)) if not isinstance(v, bytes) else None
        except (ValueError, TypeError):
            return None
        return v

    data = [tuple(_coerce(v, t) for v, t in zip(row, types)) for row in data]
    return spark.createDataFrame(data, schema=schema)
