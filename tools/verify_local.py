#!/usr/bin/env python3
"""Local emulation of the driver's correctness gate:
run graft.Verify (done separately via sbt), then for each query compare the
parquet dump against the DuckDB oracle SQL (row count, schema names, value
hash with columns sorted by name, rows sorted)."""
import json, sys, math
import duckdb

def canon(rows, cols):
    out = []
    for r in rows:
        vals = []
        for c in cols:
            v = r[c]
            if isinstance(v, float):
                if v != v:
                    vals.append("nan")
                else:
                    vals.append(f"{v:.10g}")
            else:
                vals.append(str(v))
        out.append("|".join(vals))
    out.sort()
    return out

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").fetchdf()
            want = con.execute(sql).fetchdf()
            gcols = sorted(got.columns); wcols = sorted(want.columns)
            if gcols != wcols:
                print(f"FAIL {name}: schema {gcols} != {wcols}")
                n_fail += 1; continue
            if len(got) != len(want):
                print(f"FAIL {name}: rows {len(got)} != {len(want)}")
                n_fail += 1; continue
            g = canon(got.to_dict("records"), gcols)
            w = canon(want.to_dict("records"), wcols)
            if g != w:
                bad = [(a, b) for a, b in zip(g, w) if a != b][:3]
                print(f"FAIL {name}: value mismatch, e.g. {bad}")
                n_fail += 1; continue
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
        except Exception as e:
            print(f"ERROR {name}: {e}")
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
