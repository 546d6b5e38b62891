#!/usr/bin/env python3
"""Local replica of the driver's DuckDB oracle compare.

Also the ORACLE-DURATION REGRESSION GATE (round-19 task): the driver's
correctness artifact came back non-empty in r18 only because the CTE
materialization cut the compare from ~16 min to ~14 s — one new heavy
composed oracle silently reverting to an inlined chain would zero the
artifact again. Every oracle's DuckDB wall-time is recorded, the gate
FAILS the run when any single oracle exceeds ORACLE_SEC_LIMIT (default
60 s — the r18 pathological case, q143 inlined, was 795 s; the current
worst materialized oracle is well under 10 s at sf0.01), and the full
timing table is written next to this script (tools/oracle_timings.json,
committed) so regressions diff visibly.
"""
import json, sys, glob, os, time
import duckdb
import pandas as pd

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_r11"
only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
ORACLE_SEC_LIMIT = float(os.environ.get("ORACLE_SEC_LIMIT", "60"))

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    p = f"{SF}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{OUT}/oracle_sql.json"))
fails, passes, absent = [], [], []
oracle_sec = {}
for name, sql in sorted(oracle.items()):
    if only and name not in only: continue
    d = f"{OUT}/{name}"
    if not os.path.isdir(d):
        absent.append(name); continue
    try:
        spark_df = pd.concat([pd.read_parquet(f) for f in glob.glob(f"{d}/*.parquet")]) \
            if glob.glob(f"{d}/*.parquet") else pd.DataFrame()
        t0 = time.monotonic()
        ora_df = con.execute(sql).df()
        oracle_sec[name] = round(time.monotonic() - t0, 3)
        sc = sorted(spark_df.columns); oc = sorted(ora_df.columns)
        if sc != oc:
            fails.append((name, f"schema {sc} vs {oc}")); continue
        if len(spark_df) != len(ora_df):
            fails.append((name, f"rows {len(spark_df)} vs {len(ora_df)}")); continue
        a = spark_df[sc].copy(); b = ora_df[sc].copy()
        def norm(df):
            for c in df.columns:
                if df[c].dtype == object:
                    df[c] = df[c].map(lambda v: str(v) if v is not None else None)
                elif str(df[c].dtype).startswith("float"):
                    df[c] = df[c].round(6)
                elif "datetime" in str(df[c].dtype):
                    df[c] = df[c].astype("datetime64[us]").astype(str)
            return df.sort_values(by=list(df.columns), na_position="first").reset_index(drop=True)
        a, b = norm(a), norm(b)
        try:
            eq = a.equals(b)
            if not eq:
                # tolerate int vs float dtype mismatches by string compare
                eq = a.astype(str).equals(b.astype(str))
        except Exception:
            eq = False
        if eq: passes.append(name)
        else:
            fails.append((name, "hash mismatch"))
    except Exception as e:
        fails.append((name, f"ERR {type(e).__name__}: {str(e)[:200]}"))

print(f"PASS {len(passes)}  FAIL {len(fails)}  ABSENT {len(absent)}")
for n, why in fails: print(f"  FAIL {n}: {why}")
for n in absent: print(f"  ABSENT {n}")

# --- oracle-duration regression gate ---
slowest = sorted(oracle_sec.items(), key=lambda kv: -kv[1])[:10]
if slowest:
    print("slowest oracles (s): " +
          ", ".join(f"{n}={s}" for n, s in slowest))
over = [(n, s) for n, s in oracle_sec.items() if s > ORACLE_SEC_LIMIT]
timings_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "oracle_timings.json")
# only a full (unfiltered) run refreshes the committed table
if not only:
    with open(timings_path, "w") as f:
        json.dump({"sf": SF, "limit_sec": ORACLE_SEC_LIMIT,
                   "total_sec": round(sum(oracle_sec.values()), 3),
                   "oracle_sec": dict(sorted(oracle_sec.items()))},
                  f, indent=1, sort_keys=True)
    print(f"wrote {timings_path}")

# Optional per-query JSON artifact (the builder-side correctness record —
# survives a driver artifact failure): 4th argv or CORRECTNESS_OUT env.
art = sys.argv[4] if len(sys.argv) > 4 else os.environ.get("CORRECTNESS_OUT")
if art:
    with open(art, "w") as f:
        json.dump({
            "sf": SF,
            "pass": len(passes), "fail": len(fails), "absent": len(absent),
            "queries": {**{n: "pass" for n in passes},
                        **{n: f"fail: {why}" for n, why in fails},
                        **{n: "absent" for n in absent}},
            "oracle_sec": dict(sorted(oracle_sec.items())),
        }, f, indent=1, sort_keys=True)
    print(f"wrote {art}")

if over:
    print("ORACLE DURATION GATE FAILED — an oracle crossed "
          f"{ORACLE_SEC_LIMIT}s at {SF}; a heavy composed oracle whose "
          "CTEs reverted to inlined evaluation would zero the driver's "
          "correctness artifact (r16/r17). Fix the oracle (Oracles."
          "materialize covers single-definition CTE heads) before "
          "shipping:")
    for n, s in sorted(over, key=lambda kv: -kv[1]):
        print(f"  {n}: {s}s")
    sys.exit(2)
