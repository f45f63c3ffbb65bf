"""Local mirror of the driver's DuckDB-oracle comparison.

Runs a Spark query and its oracle SQL side by side, sorts columns by
name, and compares the full multiset of rows (exact equality — floats
must already be rounded identically on both sides, which is the
engine's determinism contract)."""

from __future__ import annotations

import datetime
import math
import os

import duckdb

from graphdb_wikidata_spark.tables import TABLE_NAMES


def run_oracle(sql: str, sf_dir: str):
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{os.path.join(sf_dir, t + '.parquet')}')"
        )
    cur = con.sql(sql)
    cols = cur.columns
    rows = cur.fetchall()
    con.close()
    return cols, rows


def _norm(v):
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    return v


def compare(spark_df, oracle_sql: str, sf_dir: str) -> tuple[bool, str]:
    o_cols, o_rows = run_oracle(oracle_sql, sf_dir)
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]

    if sorted(s_cols) != sorted(c.lower() for c in o_cols) and sorted(
        c.lower() for c in s_cols
    ) != sorted(c.lower() for c in o_cols):
        return False, f"column mismatch: spark={sorted(s_cols)} oracle={sorted(o_cols)}"
    if len(s_rows) != len(o_rows):
        return False, f"rowcount mismatch: spark={len(s_rows)} oracle={len(o_rows)}"

    s_order = sorted(range(len(s_cols)), key=lambda i: s_cols[i].lower())
    o_order = sorted(range(len(o_cols)), key=lambda i: o_cols[i].lower())
    s_set = sorted(
        (tuple(_norm(r[i]) for i in s_order) for r in s_rows), key=lambda t: str(t)
    )
    o_set = sorted(
        (tuple(_norm(r[i]) for i in o_order) for r in o_rows), key=lambda t: str(t)
    )
    for a, b in zip(s_set, o_set):
        if a != b:
            return False, f"value mismatch: spark={a!r} oracle={b!r}"
    return True, "ok"
