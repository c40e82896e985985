#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run Verify's parquet
dumps against DuckDB executing oracle_sql.json over the same sf dir.

Usage: python3 scripts/oracle_check.py <sfDir> <verifyOutDir>

Compares: column names (sorted), row counts, and values (rows sorted by all
columns). Reports exact mismatches plus near-miss float diagnostics.
"""
import sys, os, json, glob
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def normalize(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object:
            df[c] = df[c].apply(
                lambda v: tuple(v) if isinstance(v, (list, np.ndarray)) else v)
    df = df.sort_values(by=list(df.columns), kind="mergesort",
                        na_position="last").reset_index(drop=True)
    return df

def main(sfdir, outdir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.isdir(p):
            # directory-shaped tables (ScaleData 25x derived sets)
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')")
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_ok = n_bad = n_near = 0
    for name in sorted(oracle):
        spark_dir = f"{outdir}/{name}"
        files = glob.glob(f"{spark_dir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output at {spark_dir}")
            n_bad += 1
            continue
        timed_out = {"flag": False}
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet({files!r})").fetchdf()
            # optional per-query oracle timeout (ORACLE_TIMEOUT_SEC):
            # at audit scale factors some DuckDB replays are quadratic
            # (the 25x semantic/LSH oracles) — interrupt and record as
            # ORACLE-TIMEOUT rather than hanging the whole audit
            timeout = float(os.environ.get("ORACLE_TIMEOUT_SEC", "0"))
            if timeout > 0:
                import threading
                def _interrupt():
                    # per-query flag: only THIS query may classify as a
                    # timeout — without it, a timer firing between query
                    # completion and cancel() poisons the NEXT query on
                    # the shared connection, which would then be
                    # misreported as ORACLE-TIMEOUT
                    timed_out["flag"] = True
                    con.interrupt()
                timer = threading.Timer(timeout, _interrupt)
                timer.start()
                try:
                    want = con.execute(oracle[name]).fetchdf()
                finally:
                    timer.cancel()
                if timed_out["flag"]:
                    # fired after completion: absorb any pending interrupt
                    # so it cannot kill the next statement
                    try:
                        con.execute("SELECT 1").fetchall()
                    except Exception:
                        pass
            else:
                want = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            msg = str(e)
            if timed_out["flag"] and "INTERRUPT" in msg.upper():
                print(f"SKIP {name}: ORACLE-TIMEOUT after {timeout}s "
                      f"(DuckDB-side; spark output present, {len(got)} rows)")
                # leave the connection clean for the next query
                try:
                    con.execute("SELECT 1").fetchall()
                except Exception:
                    pass
            else:
                print(f"FAIL {name}: exec error: {e}")
                n_bad += 1
            continue
        g, w = normalize(got), normalize(want)
        if list(g.columns) != list(w.columns):
            print(f"FAIL {name}: columns {list(g.columns)} != {list(w.columns)}")
            n_bad += 1
            continue
        if len(g) != len(w):
            print(f"FAIL {name}: rows {len(g)} != {len(w)}")
            n_bad += 1
            continue
        diffs = []
        near_notes = []
        # NEAR_ABS (e.g. 0.01): accept an absolute diff up to this bound,
        # but ONLY on columns that are 2-decimal-rounded on BOTH sides —
        # the documented one-cent float-summation-order class on
        # round(sum(double), 2) aggregates at audit scale factors.
        # The sf0.01 driver gate never sets it, so that stays hash-exact.
        near_abs = float(os.environ.get("NEAR_ABS", "0"))
        for c in g.columns:
            a, b = g[c], w[c]
            if pd.api.types.is_float_dtype(a) or pd.api.types.is_float_dtype(b):
                af = a.astype(float).to_numpy()
                bf = b.astype(float).to_numpy()
                eq = (af == bf) | (np.isnan(af) & np.isnan(bf))
                if not eq.all():
                    if near_abs > 0:
                        def two_dec(x):
                            fin = x[np.isfinite(x)]
                            c = fin * 100
                            # ulp-relative epsilon: at 1e10+ magnitudes
                            # v*100 cannot round-trip to 1e-6 absolute —
                            # a genuinely-2-decimal value still lands
                            # within a few ulps of an integer, while a
                            # 3rd decimal digit is >= 0.1 away
                            tol = np.maximum(1e-6, np.abs(c) * 4e-15)
                            return np.all(np.abs(np.round(c) - c) <= tol)
                        # rows already equal (incl. inf==inf, NaN~NaN)
                        # contribute zero — inf - inf would be NaN and
                        # falsely disqualify the column
                        nansafe = np.where(eq, 0.0, af - bf)
                        # the bound itself needs ulp slack: a one-cent
                        # difference between doubles at 1e10 magnitude
                        # materializes as 0.01 +/- ~1e-5
                        fin_b = bf[np.isfinite(bf)]
                        ulp_slack = (np.abs(fin_b).max() * 4e-15
                                     if fin_b.size else 0.0)
                        if (two_dec(af) and two_dec(bf) and
                                not np.isnan(nansafe).any() and
                                np.abs(nansafe).max()
                                <= near_abs + ulp_slack + 1e-12):
                            near_notes.append(
                                f"{c} |Δ|max={np.abs(nansafe).max():.4f}"
                                f" ({(~eq).sum()}/{len(eq)} rows)")
                            continue
                    close = np.isclose(af, bf, rtol=1e-9, equal_nan=True)
                    tag = "NEAR" if close.all() else "DIFF"
                    i = int(np.argmin(eq))
                    diffs.append(f"{c}[{tag}] e.g. row{i}: {af[i]!r} vs {bf[i]!r} "
                                 f"({(~eq).sum()}/{len(eq)} differ)")
            else:
                eq = (a.astype(str).fillna("\x00") == b.astype(str).fillna("\x00"))
                if not eq.all():
                    i = int(np.argmin(eq.to_numpy()))
                    diffs.append(f"{c} e.g. row{i}: {a.iloc[i]!r} vs {b.iloc[i]!r} "
                                 f"({(~eq).sum()}/{len(eq)} differ)")
        if diffs:
            print(f"FAIL {name}: " + "; ".join(diffs[:4]))
            n_bad += 1
        elif near_notes:
            print(f"NEAR {name} ({len(g)} rows): " + "; ".join(near_notes[:4]))
            n_near += 1
        else:
            # also flag dtype drift (driver checks schema)
            dt = [(c, str(got[c].dtype), str(want[c].dtype))
                  for c in sorted(got.columns)
                  if str(got[sorted(got.columns)].dtypes[c]) !=
                     str(want[sorted(want.columns)].dtypes[c])]
            note = f"  [dtype drift: {dt}]" if dt else ""
            print(f"ok   {name} ({len(g)} rows){note}")
            n_ok += 1
    near_abs_env = float(os.environ.get("NEAR_ABS", "0"))
    # NEAR_ABS loosens the float oracle — if the env var is set AT ALL
    # (even with zero nears) it must be visible in the summary and the
    # machine-readable line, so a gate that accidentally inherits it is
    # detectable from the artifact alone, not just per-query stdout.
    near = (f", {n_near} near [NEAR_ABS={near_abs_env}]" if near_abs_env > 0
            else (f", {n_near} near" if n_near else ""))
    print(f"== {n_ok} ok{near}, {n_bad} fail ==")
    print("SUMMARY " + json.dumps({"ok": n_ok, "near": n_near,
                                   "fail": n_bad,
                                   "near_abs": near_abs_env}))
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
