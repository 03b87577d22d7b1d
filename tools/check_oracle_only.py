"""check_oracle.py restricted to a comma-separated query list (arg 3) —
the optimization round's fast loop: verify just the touched queries."""
import duckdb, json, sys
sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/vout"
only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
con = duckdb.connect()
for t in ['region','nation','customer','supplier','part','orders','lineitem','events','documents','embeddings']:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
oracle = json.load(open(f"{outdir}/oracle_sql.json"))
if only is not None:
    oracle = {k: v for k, v in oracle.items() if k in only}
fails = []
for name, sql in sorted(oracle.items()):
    try:
        odf = con.execute(sql).fetchdf()
        sdf = con.execute(f"SELECT * FROM '{outdir}/{name}/*.parquet'").fetchdf()
        o = odf[sorted(odf.columns)].sort_values(by=sorted(odf.columns)).reset_index(drop=True)
        s = sdf[sorted(sdf.columns)].sort_values(by=sorted(sdf.columns)).reset_index(drop=True)
        if list(o.columns) != list(s.columns):
            fails.append((name, f"cols oracle={list(o.columns)} spark={list(s.columns)}")); continue
        if len(o) != len(s):
            fails.append((name, f"rows oracle={len(o)} spark={len(s)}")); continue
        if not o.equals(s):
            diff = (o != s) & ~(o.isna() & s.isna())
            bad = diff.any(axis=1)
            fails.append((name, f"value mismatch {int(bad.sum())} rows; first:\noracle:\n{o[bad].head(3)}\nspark:\n{s[bad].head(3)}"))
            continue
        print(f"OK   {name}: {len(o)} rows")
    except Exception as e:
        fails.append((name, f"EXC {e}"))
for name, msg in fails:
    print(f"FAIL {name}: {msg}")
print(f"\n{len(oracle)-len(fails)}/{len(oracle)} match")
sys.exit(1 if fails else 0)
