#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle SQL in
DuckDB over the testdata parquet tables and compare against the engine's
Verify dump (rows / schema / hashed values, columns sorted by name)."""
import sys, json, glob, os
import duckdb
import pandas as pd

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
# engine-side failures recorded by graft.Verify — surfaced as explicit
# err rows so a broken query can never read as mere coverage shrink
engine_errors = {}
if os.path.exists(f"{out_dir}/errors.json"):
    engine_errors = json.load(open(f"{out_dir}/errors.json"))

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes: ints -> int64, floats -> float64, timestamps -> us
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]): df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]): df[c] = df[c].astype("float64")
        elif pd.api.types.is_datetime64_any_dtype(df[c]):
            if getattr(df[c].dtype, "tz", None) is not None:
                df[c] = df[c].dt.tz_convert("UTC").dt.tz_localize(None)
            df[c] = df[c].astype("datetime64[us]")
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

results = {}
for name, sql in sorted(oracle.items()):
    try:
        if name in engine_errors:
            results[name] = {"status": "ENGINE_ERROR",
                             "err": engine_errors[name][:300]}
            continue
        eng_files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not eng_files:
            results[name] = {"status": "MISSING_ENGINE_OUTPUT"}
            continue
        eng = canon(con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df())
        ora = canon(con.sql(sql).df())
        rows = len(eng) == len(ora)
        schema = list(eng.columns) == list(ora.columns)
        if rows and schema:
            eq = eng.equals(ora)
            if not eq:
                # detailed diff for floats: count exact mismatches
                diffs = {}
                for c in eng.columns:
                    if not eng[c].equals(ora[c]):
                        n = int((~(eng[c].eq(ora[c]) | (eng[c].isna() & ora[c].isna()))).sum())
                        diffs[c] = n
                results[name] = {"status": "HASH_MISMATCH", "col_diffs": diffs,
                                 "rows": len(eng)}
            else:
                results[name] = {"status": "OK", "rows": len(eng)}
        else:
            results[name] = {"status": "SHAPE_MISMATCH",
                             "eng": [len(eng), list(eng.columns)],
                             "ora": [len(ora), list(ora.columns)]}
    except Exception as e:
        results[name] = {"status": "ERROR", "err": str(e)[:300]}

ok = sum(1 for r in results.values() if r["status"] == "OK")
for name, r in results.items():
    flag = "✓" if r["status"] == "OK" else "✗"
    print(f"{flag} {name}: {json.dumps(r)[:240]}")
print(f"\n{ok}/{len(results)} OK")
