#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run Verify's parquet
dumps against the oracle SQL in DuckDB over the same inputs, compare as
canonicalized multisets (columns sorted by name, values stringified).

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
"""
import sys, os, json, glob, math
import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon_val(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # exact repr, no rounding — the driver hashes exact values, so a
        # last-ulp interpolation difference must FAIL here too
        return repr(v)
    if isinstance(v, bytes):
        return v.hex()
    return str(v)

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = sorted(tuple(canon_val(r[i]) for i in order) for r in rows)
    return [cols[i] for i in order], out

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    n_pass = n_fail = 0
    for name in names:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        tbl = pq.read_table(files[0])
        # The driver's hasher coerces DuckDB wide decimals to float while
        # Spark parquet keeps Decimal — trailing-zero values ('458723.00')
        # then hash-mismatch even when identical. Flag any decimal output.
        for f in tbl.schema:
            if "decimal" in str(f.type):
                print(f"WARN {name}: decimal output column '{f.name}' "
                      f"({f.type}) — driver hash risk; emit BIGINT cents")
        s_cols = list(tbl.column_names)
        s_rows = [tuple(d[c] for c in s_cols) for d in tbl.to_pylist()]
        if name not in oracle:
            print(f"SKIP {name}: no oracle ({len(s_rows)} rows)"); continue
        try:
            # DuckDB widens sum(INTEGER)/sum(BIGINT) to HUGEINT (int128) —
            # including window sums — and the driver's hasher coerces wide
            # ints to float ('3.0' != '3'), same trap as decimals above.
            # Any HUGEINT oracle column must be CAST(... AS BIGINT).
            rel = con.sql(oracle[name])
            for cname, ctype in zip(rel.columns, (str(t) for t in rel.types)):
                if "HUGEINT" in ctype.upper() or "INT128" in ctype.upper():
                    print(f"WARN {name}: oracle column '{cname}' is {ctype} "
                          f"— driver hash risk; CAST(... AS BIGINT) in the SQL")
            res = con.execute(oracle[name])
            d_cols = [c[0] for c in res.description]
            d_rows = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}"); n_fail += 1; continue
        sc, sr = canon(s_rows, s_cols)
        dc, dr = canon(d_rows, d_cols)
        if sc != dc:
            print(f"FAIL {name}: columns {sc} vs {dc}"); n_fail += 1; continue
        if sr != dr:
            n_fail += 1
            print(f"FAIL {name}: rows {len(sr)} vs {len(dr)}")
            sset, dset = set(sr), set(dr)
            for r in list(sset - dset)[:3]:
                print(f"   spark-only: {r}")
            for r in list(dset - sset)[:3]:
                print(f"   duck-only : {r}")
            continue
        n_pass += 1
        print(f"PASS {name} ({len(sr)} rows)")
    print(f"== {n_pass} pass, {n_fail} fail, {len(names)} total")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
