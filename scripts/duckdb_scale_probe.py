#!/usr/bin/env python3
"""Time the headline queries in DuckDB on an arbitrary sf dir WITHOUT
touching the pinned BASELINE_DUCKDB.json — used for the scaling-curve
measurement against ScaleData-derived datasets.

Usage: python3 scripts/duckdb_scale_probe.py <sfDir> <verifyOutDir> [runs]
"""
import sys, os, json, time
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

BENCH = ["q01_pricing_summary", "q03_shipping_priority",
         "q05_local_supplier_volume", "q06_forecast_revenue",
         "q04_order_priority", "q07_volume_shipping", "q09_product_profit",
         "q31_window_lead_lag", "q58_date_bin", "q70_bitemp_asof",
         "q72_asof_join", "q80_dedup_exact", "q82_dedup_minhash_pairs",
         "q85_similarity_topk", "q91_similarity_lsh"]


def main(sfdir, outdir, runs=3):
    oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count()}")
    for t in TABLES:
        p = os.path.join(sfdir, f"{t}.parquet")
        if os.path.exists(p):
            # ScaleData writes directories of part files
            glob = p + "/*.parquet" if os.path.isdir(p) else p
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{glob}'")
    result = {}
    for name in BENCH:
        best = None
        for _ in range(runs):
            t0 = time.time()
            con.execute(oracle[name]).fetchall()
            best = min(best, time.time() - t0) if best else time.time() - t0
        result[name] = round(best, 3)
        print(f"{name:32s} {best:7.3f}s")
    print(json.dumps({"sf_dir": sfdir, "total_sec": round(sum(result.values()), 3),
                      "queries": result}))


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2],
         int(sys.argv[3]) if len(sys.argv) > 3 else 3)
