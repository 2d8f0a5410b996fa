#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate (dev tooling only,
not part of the shipped library): run after `sbt "runMain graft.Verify
<sfDir> <outDir>"`, compares each dumped parquet against its DuckDB oracle.

Mimics the driver's compare: sort columns by name, sort rows by all columns,
then hash values DTYPE-SENSITIVELY (so an int64 123 vs float64 123.0 is a
mismatch, like the driver's hasher). Value-equality diagnostics are printed
when only the dtype-sensitive hash differs.

Usage: python3 tools/check.py /root/testdata/sf0.01 /tmp/verify_out
"""
import json, sys
import duckdb
import pandas as pd


def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def cell_repr(v):
    # dtype-sensitive: repr keeps 123 vs 123.0 distinct, like a value hasher
    return repr(v)


def frame_sig(df):
    return [tuple(cell_repr(v) for v in row) for row in df.itertuples(index=False)]


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
        errs = []
        try:
            got, exp = canon(got), canon(exp)
        except Exception as e:
            errs.append(f"row-sort failed (driver would also crash here): {e}")
        if not errs and list(got.columns) != list(exp.columns):
            errs.append(f"columns {list(got.columns)} != {list(exp.columns)}")
        elif not errs and len(got) != len(exp):
            errs.append(f"rows {len(got)} != {len(exp)}")
        elif not errs:
            sg, se = frame_sig(got), frame_sig(exp)
            if sg != se:
                i = next(i for i, (a, b) in enumerate(zip(sg, se)) if a != b)
                n_diff = sum(1 for a, b in zip(sg, se) if a != b)
                errs.append(f"hash mismatch row {i}: {sg[i]} != {se[i]} ({n_diff} rows differ)")
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
