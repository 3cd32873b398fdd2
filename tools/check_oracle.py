#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate (NOT part of the engine).

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (written by graft.Verify), runs the
matching oracle SQL from oracle_sql.json in DuckDB over the raw testdata
tables, sorts columns by name (the driver does), and compares row-by-row.
"""
import sys, json, math, glob
import duckdb

TABLES = ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]

def canon(v):
    if isinstance(v, float):
        if math.isnan(v): return "nan"
        return repr(v)
    return str(v)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    names = sorted(set([p.split('/')[-1] for p in glob.glob(f"{out_dir}/q*")]))
    n_pass = n_fail = 0
    for name in names:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        spark_df = con.execute(
            f"SELECT * FROM read_parquet({files!r})").fetchdf()
        if name not in oracles:
            print(f"ROWS {name}: rows-only, {len(spark_df)} rows" +
                  (" (EMPTY!)" if len(spark_df)==0 else ""))
            continue
        try:
            ora_df = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}"); n_fail += 1; continue
        s = spark_df[sorted(spark_df.columns)]
        o = ora_df[sorted(ora_df.columns)]
        if list(s.columns) != list(o.columns):
            print(f"FAIL {name}: columns {list(s.columns)} vs {list(o.columns)}"); n_fail += 1; continue
        if len(s) != len(o):
            print(f"FAIL {name}: rows {len(s)} vs {len(o)}"); n_fail += 1; continue
        sv = [[canon(v) for v in row] for row in s.itertuples(index=False)]
        ov = [[canon(v) for v in row] for row in o.itertuples(index=False)]
        if sv == ov:
            print(f"PASS {name} ({len(s)} rows)"); n_pass += 1
        else:
            diffs = [(i, a, b) for i, (a, b) in enumerate(zip(sv, ov)) if a != b]
            print(f"FAIL {name}: {len(diffs)}/{len(sv)} row diffs; first: "
                  f"row {diffs[0][0]}: spark={diffs[0][1]} oracle={diffs[0][2]}")
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
