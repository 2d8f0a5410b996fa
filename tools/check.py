#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate (dev tooling only,
not part of the shipped library): run after `sbt "runMain graft.Verify
<sfDir> <outDir>"`, compares each dumped parquet against its DuckDB oracle.

Usage: python3 tools/check.py /root/testdata/sf0.01 /tmp/verify_out
"""
import json, sys, math
import duckdb

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        try:
            got = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetchdf()
            exp = con.sql(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: exec error: {e}")
            n_fail += 1
            continue
        got = got.reindex(sorted(got.columns), axis=1)
        exp = exp.reindex(sorted(exp.columns), axis=1)
        errs = []
        if list(got.columns) != list(exp.columns):
            errs.append(f"columns {list(got.columns)} != {list(exp.columns)}")
        elif len(got) != len(exp):
            errs.append(f"rows {len(got)} != {len(exp)}")
        else:
            for c in got.columns:
                a, b = got[c], exp[c]
                try:
                    eq = (a == b) | (a.isna() & b.isna())
                except Exception:
                    eq = a.astype(str) == b.astype(str)
                if not eq.all():
                    i = int((~eq).idxmax())
                    errs.append(f"col {c} first mismatch row {i}: {a[i]!r} != {b[i]!r} "
                                f"({int((~eq).sum())} rows differ) [dtypes {a.dtype}/{b.dtype}]")
        if errs:
            print(f"FAIL {name}: " + "; ".join(errs))
            n_fail += 1
        else:
            print(f"ok   {name} ({len(got)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
