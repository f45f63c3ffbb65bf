"""Local mirror of the driver's DuckDB-oracle comparison.

Runs a Spark query and its oracle SQL side by side, sorts columns by
name, and compares the full multiset of rows (exact equality — floats
must already be rounded identically on both sides, which is the
engine's determinism contract).

Dtype sensitivity (VERDICT r04 task 1): the real driver materializes
both sides as pandas and hashes dtype-sensitively, so an oracle column
DuckDB types as HUGEINT (pandas float64) hash-mismatches Spark's int64
even when every value is equal — exactly the `corpus_mix_budget` r04
red row. We mirror that here by fetching the oracle through `.df()`
(pandas, not fetchall — fetchall converts HUGEINT to Python int and
hides the divergence) and comparing per-column pandas dtype *kinds*
(int vs float vs bool vs object/datetime) before comparing values."""

from __future__ import annotations

import datetime
import math
import os

import duckdb

from graphdb_wikidata_spark.tables import TABLE_NAMES


def oracle_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{os.path.join(sf_dir, t + '.parquet')}')"
        )
    return con


def run_oracle(sql: str, sf_dir: str):
    con = oracle_connection(sf_dir)
    cur = con.sql(sql)
    cols = cur.columns
    pdf = cur.df()  # pandas, like the driver — HUGEINT lands as float64 here
    rows = [tuple(r) for r in pdf.itertuples(index=False, name=None)]
    kinds = {c.lower(): pdf.dtypes.iloc[i].kind for i, c in enumerate(pdf.columns)}
    con.close()
    return cols, rows, kinds


_KIND_GROUP = {"i": "int", "u": "int", "f": "float", "b": "bool"}


def _kind_group(kind: str) -> str:
    return _KIND_GROUP.get(kind, "other")


def _norm(v):
    import numpy as np
    import pandas as pd

    if v is None or v is pd.NaT:
        return None
    if isinstance(v, (bool, np.bool_)):
        return bool(v)
    if isinstance(v, (float, np.floating)):
        v = float(v)
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, np.integer):
        return int(v)
    if isinstance(v, pd.Timestamp):
        return v.to_pydatetime().isoformat()
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, np.ndarray):
        return tuple(_norm(x) for x in v.tolist())
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    return v


def compare(spark_df, oracle_sql: str, sf_dir: str) -> tuple[bool, str]:
    o_cols, o_rows, o_kinds = run_oracle(oracle_sql, sf_dir)
    s_pdf = spark_df.toPandas()
    s_cols = list(s_pdf.columns)
    s_rows = [tuple(r) for r in s_pdf.itertuples(index=False, name=None)]
    s_kinds = {c.lower(): s_pdf.dtypes.iloc[i].kind for i, c in enumerate(s_cols)}

    if sorted(s_cols) != sorted(c.lower() for c in o_cols) and sorted(
        c.lower() for c in s_cols
    ) != sorted(c.lower() for c in o_cols):
        return False, f"column mismatch: spark={sorted(s_cols)} oracle={sorted(o_cols)}"
    if len(s_rows) != len(o_rows):
        return False, f"rowcount mismatch: spark={len(s_rows)} oracle={len(o_rows)}"

    # Dtype-kind gate, mirroring the driver's dtype-sensitive hash: an
    # int64 Spark column vs a float64 oracle column is a FAIL even with
    # identical values. Kinds are compared as groups (i/u → int) so a
    # width difference is fine but an int/float divergence is not. A
    # fully-null column on either side is exempt (pandas types it object
    # or float64 with no values to disagree on).
    s_by_lower = {c.lower(): c for c in s_cols}
    o_idx = {c.lower(): i for i, c in enumerate(o_cols)}
    for c in s_kinds:
        if c not in o_kinds:
            continue
        sk, ok = _kind_group(s_kinds[c]), _kind_group(o_kinds[c])
        if sk != ok:
            s_allnull = bool(s_pdf[s_by_lower[c]].isna().all())
            i = o_idx[c]
            o_allnull = all(
                r[i] is None or (isinstance(r[i], float) and math.isnan(r[i]))
                for r in o_rows
            )
            if s_allnull or o_allnull:
                continue
            return False, (
                f"dtype-kind mismatch on '{c}': "
                f"spark={s_kinds[c]}({sk}) oracle={o_kinds[c]}({ok})"
            )

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
