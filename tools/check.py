#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness compare.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [entry,entry,...]

Mirrors the driver contract: for each entry in oracle_sql.json, run the
SQL in DuckDB over the sfDir parquet tables, read the Spark result
parquet, sort columns by name, sort rows, and compare row counts,
schemas (column names) and values. Floats are compared with repr() after
round(12) to absorb printing noise only — the driver hashes exactly, so
treat any float mismatch reported here as a real failure to fix, not to
tolerate.
"""
import sys, json, glob, duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if isinstance(v, float):
        return repr(round(v, 12))
    return v

def perplexity_boundary_guard(con, tol=1e-9):
    """t14 computes floor(ln(N/cnt)*1000) in BOTH engines; Math.log (JVM)
    and libm log (DuckDB) are only 1-ulp accurate, so a true value within
    ~1e-12 of an integer milli-nat boundary could floor differently per
    engine. Exact landing is impossible (ln of a rational is never a
    nonzero rational, Lindemann-Weierstrass), but flag any corpus where a
    (cnt, N) pair comes within `tol` of a boundary so the flake surfaces
    HERE, not in the driver's hash compare (ADVICE r6)."""
    import math
    try:
        pairs = con.execute("""
            WITH t AS (SELECT unnest(string_split_regex(lower(text),
                         '[^a-z0-9]+')) AS tok FROM documents),
            td AS (SELECT tok FROM t WHERE tok <> ''),
            v AS (SELECT tok, count(*) AS cnt FROM td GROUP BY tok)
            SELECT DISTINCT cnt, (SELECT count(*) FROM td) AS n FROM v
        """).fetchall()
    except Exception:
        return  # no documents table in this fixture dir
    risky = [(c, n) for c, n in pairs
             if c != n and abs((x := math.log(n / c) * 1000) - round(x)) < tol]
    if risky:
        print(f"t14 BOUNDARY GUARD: {len(risky)} (cnt,N) pairs within "
              f"{tol} of a milli-nat floor boundary: {risky[:5]} — "
              f"cross-engine ln rounding may flip the hash on this corpus")


def main():
    sf, out = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    sqls = json.load(open(f"{out}/oracle_sql.json"))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    perplexity_boundary_guard(con)
    n_ok = n_bad = 0
    for name in sorted(sqls):
        if only and name not in only:
            continue
        files = glob.glob(f"{out}/{name}/*.parquet")
        if not files:
            print(f"{name}: MISSING spark result")
            n_bad += 1
            continue
        try:
            oracle = con.execute(sqls[name]).fetch_arrow_table()
        except Exception as e:
            print(f"{name}: ORACLE ERR {e}")
            n_bad += 1
            continue
        spark = duckdb.sql(
            f"SELECT * FROM read_parquet('{out}/{name}/*.parquet')"
        ).fetch_arrow_table()
        ocols = sorted(oracle.column_names)
        scols = sorted(spark.column_names)
        if ocols != scols:
            print(f"{name}: SCHEMA MISMATCH spark={scols} oracle={ocols}")
            n_bad += 1
            continue
        # key=repr: NULL cells make heterogeneous tuples unorderable in
        # Python (None < int raises); any consistent total order works
        # since only multiset equality is checked
        orows = sorted((tuple(norm(r[c]) for c in ocols)
                        for r in oracle.to_pylist()), key=repr)
        srows = sorted((tuple(norm(r[c]) for c in scols)
                        for r in spark.to_pylist()), key=repr)
        if len(orows) != len(srows):
            print(f"{name}: ROWS spark={len(srows)} oracle={len(orows)}")
            n_bad += 1
        elif orows != srows:
            diff = next(i for i, (a, b) in enumerate(zip(orows, srows))
                        if a != b)
            print(f"{name}: VALUE MISMATCH at sorted row {diff}:\n"
                  f"  spark : {srows[diff]}\n  oracle: {orows[diff]}")
            n_bad += 1
        else:
            print(f"{name}: ok ({len(srows)} rows)")
            n_ok += 1
    print(f"== {n_ok} ok, {n_bad} bad ==")
    sys.exit(1 if n_bad else 0)

if __name__ == "__main__":
    main()
