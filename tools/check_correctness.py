#!/usr/bin/env python3
"""Dev-only local mimic of the driver's correctness gate (NOT part of the
engine): reads each Verify output parquet, runs the corresponding oracle
SQL in DuckDB over the same testdata parquet tables, and compares
row/schema/values after sorting columns by name and rows by value.

Usage: check_correctness.py <sfDir> <verifyOutDir>
"""
import json, sys, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def canon(rows):
    def norm(v):
        if isinstance(v, float):
            if math.isnan(v):
                return "NaN"
            return repr(v)
        return repr(v)
    return sorted(tuple(norm(v) for v in row) for row in rows)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    ok = fail = 0
    import glob
    names = sorted(d.split("/")[-1] for d in glob.glob(f"{out_dir}/*")
                   if not d.endswith(".json"))
    for name in names:
        got = con.execute(
            f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetchdf()
        got = got.reindex(sorted(got.columns), axis=1)
        if name not in oracle:
            print(f"  {name}: rows-only ({len(got)} rows) "
                  + ("OK" if len(got) > 0 else "EMPTY!"))
            continue
        exp = con.execute(oracle[name]).fetchdf()
        exp = exp.reindex(sorted(exp.columns), axis=1)
        scols = list(got.columns); ocols = list(exp.columns)
        if scols != ocols:
            print(f"✗ {name}: COLUMNS spark={scols} oracle={ocols}")
            fail += 1
            continue
        g = canon(got.itertuples(index=False, name=None))
        e = canon(exp.itertuples(index=False, name=None))
        if len(g) != len(e):
            print(f"✗ {name}: ROWS spark={len(g)} oracle={len(e)}")
            fail += 1
        elif g != e:
            diffs = [i for i, (a, b) in enumerate(zip(g, e)) if a != b]
            print(f"✗ {name}: VALUES differ in {len(diffs)}/{len(g)} rows; "
                  f"first: spark={g[diffs[0]]} oracle={e[diffs[0]]}")
            fail += 1
        else:
            print(f"✓ {name}: {len(g)} rows match")
            ok += 1
    print(f"\n{ok} match, {fail} mismatch, "
          f"{len(names) - ok - fail} rows-only")
    return 1 if fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
