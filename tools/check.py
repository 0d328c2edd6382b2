#!/usr/bin/env python3
"""Local oracle harness (driver-side python is allowed for tooling).

Usage:
  sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/graft_verify"
  python3 tools/check.py /root/testdata/sf0.01 /tmp/graft_verify

Emulates the driver's t2 gate: loads each Spark result parquet, runs the
corresponding oracle SQL in DuckDB against the raw testdata tables, and
compares row multisets (columns sorted by name, values normalized).
"""
import sys, json, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    # Type-TAGGED canonicalization: the driver's hash distinguishes a
    # Decimal 123 from an int 123 (scale-0 decimal128 renders
    # reader-dependently), so equal digits with different types must
    # fail HERE the way they fail on the driver (r8 lesson: 13 queries
    # passed untagged locally and failed the driver gate).
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, list):
        return "[" + ",".join(norm(x) for x in v) + "]"
    import decimal
    if isinstance(v, decimal.Decimal):
        return "dec:" + str(v)
    if isinstance(v, int):
        return "int:" + str(v)
    return str(v)


def dec38_cols(con, res_glob):
    """Published-schema census: decimal(38,0) output columns hash
    reader-dependently downstream — no registry query may publish one
    (cast to string at the registry; keep internal math decimal)."""
    rel = con.sql(f"DESCRIBE SELECT * FROM read_parquet('{res_glob}')")
    return [r[0] for r in rel.fetchall() if r[1] == "DECIMAL(38,0)"]


def hugeint_cols(con, sql):
    """Oracle-side type census (r14 lesson — the three driver-only
    hash misses): DuckDB widens sum(BIGINT) to HUGEINT (int128).
    The python client hands HUGEINT back as a plain int, so THIS
    harness can't see the difference — but the driver's type-tagged
    hash distinguishes int128 from Spark's int64 and fails the query
    on every run. No oracle may publish a HUGEINT column: cast the
    sum to bigint (same value) in the oracle SQL."""
    rel = con.sql(f"DESCRIBE {sql}")
    return [r[0] for r in rel.fetchall() if r[1] in ("HUGEINT", "UHUGEINT")]


def canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = sorted("|".join(norm(r[i]) for i in order) for r in rows)
    return out


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    failures = 0
    for name, sql in sorted(oracle.items()):
        res_glob = os.path.join(out_dir, name, "*.parquet")
        if not glob.glob(res_glob):
            print(f"[MISS] {name}: no spark result at {res_glob}")
            failures += 1
            continue
        try:
            bad = dec38_cols(con, res_glob)
            if bad:
                print(f"[DC38] {name}: decimal(38,0) published: {bad}")
                failures += 1
                continue
            hbad = hugeint_cols(con, sql)
            if hbad:
                print(f"[HUGE] {name}: oracle publishes HUGEINT: {hbad}")
                failures += 1
                continue
            spark_rel = con.sql(f"SELECT * FROM read_parquet('{res_glob}')")
            spark_cols = [d[0] for d in spark_rel.description]
            spark_rows = spark_rel.fetchall()
            ora_rel = con.sql(sql)
            ora_cols = [d[0] for d in ora_rel.description]
            ora_rows = ora_rel.fetchall()
        except Exception as e:
            print(f"[ERR ] {name}: {e}")
            failures += 1
            continue
        if sorted(spark_cols) != sorted(ora_cols):
            print(f"[COLS] {name}: spark={sorted(spark_cols)} oracle={sorted(ora_cols)}")
            failures += 1
            continue
        a, b = canon(spark_cols, spark_rows), canon(ora_cols, ora_rows)
        if a == b:
            print(f"[ OK ] {name}: {len(a)} rows")
        else:
            failures += 1
            diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
            print(f"[FAIL] {name}: rows spark={len(a)} oracle={len(b)}")
            for x, y in diff:
                print(f"    spark:  {x[:160]}")
                print(f"    oracle: {y[:160]}")
    # queries with no oracle: rows-only check
    declared = set(oracle)
    for d in sorted(os.listdir(out_dir)):
        p = os.path.join(out_dir, d)
        if os.path.isdir(p) and d not in declared:
            bad = dec38_cols(con, f"{p}/*.parquet")
            if bad:
                print(f"[DC38] {d}: decimal(38,0) published: {bad}")
                failures += 1
            n = con.sql(f"SELECT count(*) FROM read_parquet('{p}/*.parquet')").fetchone()[0]
            status = "ROWS" if n > 0 else "EMPTY"
            print(f"[{status}] {d}: {n} rows (no oracle)")
            if n == 0:
                failures += 1
    print("PASS" if failures == 0 else f"FAILURES: {failures}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
