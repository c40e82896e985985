#!/usr/bin/env python3
"""DuckDB side of the interval-join scale probe (tools/IntervalProbe):
the same three query shapes on the same events parquet, all cores,
best-of-N. Usage: duckdb_interval_probe.py <sfDir> [runs]"""
import json
import sys
import time

import duckdb

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
con = duckdb.connect()
con.execute("PRAGMA threads=32")
import os
path = f"{sf}/events.parquet"
if os.path.isdir(path):
    path = f"{path}/*.parquet"  # ScaleData directory layout
con.execute(
    f"CREATE VIEW events AS SELECT * FROM read_parquet('{path}')"
)


def shape(l_type, r_type, mins, op):
    return f"""
      WITH e AS (SELECT event_id, date_trunc('second', ts) AS sec,
                        event_type FROM events),
      l AS (SELECT event_id AS lid, sec AS lf,
                   sec + INTERVAL {mins} MINUTE AS lt FROM e
            WHERE event_type = '{l_type}'),
      r AS (SELECT event_id AS rid, sec AS rf,
                   sec + INTERVAL {mins} MINUTE AS rt FROM e
            WHERE event_type = '{r_type}')
      SELECT count(*) FROM (
        SELECT lid, count(*) AS n, max(rid) AS m
        FROM l {op[0]} JOIN r ON {op[1]}
        GROUP BY lid)"""


queries = {
    "q203_overlaps": shape("error", "purchase", 2,
                           ("", "lf < rt AND rf < lt")),
    "q213_closed": shape("error", "purchase", 3,
                         ("", "lf <= rt AND rf <= lt")),
    "q211_left": shape("error", "purchase", 1,
                       ("LEFT", "lf < rt AND rf < lt")),
}
out = {}
for name, q in queries.items():
    best = None
    rows = None
    for _ in range(runs):
        t0 = time.time()
        rows = con.execute(q).fetchone()[0]
        dt = time.time() - t0
        best = dt if best is None or dt < best else best
    out[name] = {"sec": round(best, 3), "rows": rows}
print(json.dumps({"probe": "interval_join_duckdb", "sf": sf,
                  "queries": out}))
