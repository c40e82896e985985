#!/usr/bin/env python3
"""Pin the numeric bench baseline: run the 15 headline queries' DuckDB
equivalents (the oracle SQL — identical semantics, identical parquet) on
sf0.1 with all cores, and write BASELINE_DUCKDB.json. Bench.scala reads
this to report spark-vs-duckdb ratios in BENCH_r{N}.json, making the
"within 2x of baseline" gate falsifiable.

Usage: python3 scripts/duckdb_baseline.py <sfDir> <verifyOutDir> [runs]
(verifyOutDir must contain oracle_sql.json from a Verify run)
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
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    result = {}
    for name in BENCH:
        sql = oracle[name]
        best = None
        for _ in range(runs):
            t0 = time.time()
            con.execute(sql).fetchall()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        result[name] = round(best, 3)
        print(f"{name:32s} {best:7.3f}s")
    total = round(sum(result.values()), 3)
    out = {"engine": "duckdb", "duckdb_version": duckdb.__version__,
           "threads": os.cpu_count(), "sf_dir": sfdir, "runs": runs,
           "total_sec": total, "queries": result}
    with open(os.path.join(os.path.dirname(__file__), "..",
                           "BASELINE_DUCKDB.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(f"total: {total}s -> BASELINE_DUCKDB.json")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2],
         int(sys.argv[3]) if len(sys.argv) > 3 else 3)
