#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle SQL in
DuckDB against the same parquet tables, compare to the Verify parquet dump.

Usage: python3 scripts/check_oracle.py /root/testdata/sf0.01 /tmp/verify_out
"""
import sys, json, math, glob, os
import duckdb
import pyarrow.parquet as pq

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # full precision
    return repr(v)

def rows_of(table):
    cols = sorted(table.column_names)
    t = table.select(cols)
    data = [col.to_pylist() for col in t.columns]
    return cols, [tuple(canon(c[i]) for c in data) for i in range(t.num_rows)]

def main(sfdir, outdir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        res_dir = f"{outdir}/{name}"
        files = glob.glob(f"{res_dir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark result dumped")
            n_fail += 1
            continue
        got = pq.read_table(files[0])
        try:
            want = con.sql(sql).arrow()
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}")
            n_fail += 1
            continue
        gc, gr = rows_of(got)
        wc, wr = rows_of(want)
        if gc != [c.lower() for c in wc] and gc != wc:
            print(f"FAIL {name}: columns {gc} vs {wc}")
            n_fail += 1
            continue
        if gr == wr:
            print(f"PASS {name} ({len(gr)} rows)")
            n_pass += 1
        else:
            # also try order-insensitive
            if sorted(gr) == sorted(wr):
                print(f"WARN {name}: row order differs (set-equal, {len(gr)} rows)")
                n_pass += 1
            else:
                print(f"FAIL {name}: {len(gr)} vs {len(wr)} rows")
                gs, ws = set(gr), set(wr)
                for r in list(gs - ws)[:3]:
                    print(f"   spark-only: {r}")
                for r in list(ws - gs)[:3]:
                    print(f"   duckdb-only: {r}")
                n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
