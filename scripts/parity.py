#!/usr/bin/env python3
"""Local mirror of the driver's t2 gate: for each SparkEntry query output
(parquet under OUTDIR), run the oracle SQL in DuckDB over the same sf tables
and compare values (columns sorted by name, exact compare)."""
import sys, json, glob, os
import duckdb

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/vout"

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
names = sorted(d for d in os.listdir(out_dir)
               if os.path.isdir(os.path.join(out_dir, d)))
n_pass = n_fail = 0
for name in names:
    files = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not files:
        print(f"FAIL {name}: no parquet written"); n_fail += 1; continue
    got = con.execute(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetchdf()
    if name not in oracles:
        ok = len(got) > 0
        print(("pass(rows-only) " if ok else "FAIL(rows-only) ") + f"{name}: {len(got)} rows")
        n_pass += ok; n_fail += (not ok)
        continue
    try:
        exp = con.execute(oracles[name]).fetchdf()
    except Exception as e:
        print(f"FAIL {name}: oracle error: {e}"); n_fail += 1; continue
    got = got[sorted(got.columns)]
    exp = exp[sorted(exp.columns)]
    if list(got.columns) != list(exp.columns):
        print(f"FAIL {name}: columns {list(got.columns)} vs {list(exp.columns)}")
        n_fail += 1; continue
    if len(got) != len(exp):
        print(f"FAIL {name}: rows {len(got)} vs {len(exp)}"); n_fail += 1; continue
    if got.dtypes.tolist() != exp.dtypes.tolist():
        print(f"WARN {name}: dtypes {got.dtypes.tolist()} vs {exp.dtypes.tolist()}")
    mism = []
    for c in got.columns:
        a, b = got[c], exp[c]
        try:
            eq = (a == b) | (a.isna() & b.isna())
        except Exception:
            eq = a.astype(str) == b.astype(str)
        if not eq.all():
            bad = (~eq).idxmax()
            mism.append(f"{c}[row {bad}]: {a[bad]!r} vs {b[bad]!r} ({int((~eq).sum())} diffs)")
    if mism:
        print(f"FAIL {name}: " + "; ".join(mism)); n_fail += 1
    else:
        print(f"pass {name}: {len(got)} rows"); n_pass += 1

print(f"\n{n_pass} pass, {n_fail} fail")
sys.exit(1 if n_fail else 0)
