"""Driver-window contract guards (VERDICT r03 items 1 and 9).

1. Schema guard: every entry in the round's CORRECTNESS window (the
   first 50 of PRIORITY_ENTRIES) must expose ONLY scalar columns — the
   driver canonicalizer sorts rows with pandas, which dies on a
   list/struct column (the r02 AND r03 red rows were both this).
2. Window-debt guard: every registry entry must either already have a
   green driver-window row in some past round (CORRECTNESS_r*.json) or
   be scheduled in the current window — a new entry cannot ship
   without a window slot.
"""

from __future__ import annotations

import glob
import json
import os

from pyspark.sql import types as T

from graphdb_wikidata_spark.operators import PRIORITY_ENTRIES, all_queries

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF = "/root/testdata/sf0.001"
WINDOW = 50  # the driver hashes the first 50 registry entries


def test_windowed_entries_expose_only_scalar_columns(spark):
    queries = all_queries()
    bad = {}
    for name in list(queries)[:WINDOW]:
        df = queries[name](spark, SF)
        nonscalar = [
            f.name
            for f in df.schema.fields
            if isinstance(f.dataType, (T.ArrayType, T.StructType, T.MapType))
        ]
        if nonscalar:
            bad[name] = nonscalar
    assert not bad, f"windowed entries with canonicalizer-unsafe columns: {bad}"


def test_every_entry_has_window_evidence_or_a_slot():
    greens: set[str] = set()
    for path in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        d = json.load(open(path))
        for k, v in d.items():
            if v.get("hash_match") or v.get("rows_match"):
                greens.add(k)
    scheduled = set(PRIORITY_ENTRIES[:WINDOW])
    debt = [n for n in all_queries() if n not in greens and n not in scheduled]
    assert not debt, (
        "entries with no green driver-window row AND no slot in this "
        f"round's window (add them to PRIORITY_ENTRIES): {debt}"
    )
