#!/usr/bin/env python3
"""Self-graded correctness check: compare graft.Verify's per-query parquet
dumps against DuckDB running SparkEntry.oracleSql over the same sf tables.

Mirrors the driver/judge compare exactly: row count, column names (sorted,
case-insensitive), and a SHA-256 over the sorted normalized row strings with
columns ordered by name. Floats normalized to 6 significant digits.

Usage:
    python3 tools/correctness_check.py [outdir] [sfdir] [report_path]

Defaults: outdir=/tmp/graft_verify_out sfdir=/root/testdata/sf0.01
          report=CORRECTNESS_SELF.json (repo root)

Writes report_path with per-query {rows_match, schema_match, hash_match}
plus rows-only coverage for queries without an oracle, and prints a one-line
summary. Exit code 0 iff every oracle-backed query fully matches.
"""
import json, hashlib, decimal, math, sys, glob, os

import duckdb


def norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.6g}"
    if isinstance(v, decimal.Decimal):
        return f"{float(v):.6g}"
    return str(v)


def row_hash(cols, rows):
    # Driver compare sorts columns BY NAME before hashing values, so a
    # matching column set hashes identically regardless of select order.
    order = sorted(range(len(cols)), key=lambda i: cols[i].lower())
    m = hashlib.sha256()
    for line in sorted("|".join(norm(r[i]) for i in order) for r in rows):
        m.update(line.encode())
        m.update(b"\n")
    return m.hexdigest()


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_verify_out"
    sfdir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    report_path = (
        sys.argv[3]
        if len(sys.argv) > 3
        else os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "CORRECTNESS_SELF.json")
    )

    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    con = duckdb.connect()
    for p in glob.glob(f"{sfdir}/*.parquet"):
        name = os.path.basename(p).replace(".parquet", "")
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

    results = {}
    # Oracle-backed queries: full rows/schema/hash parity vs DuckDB.
    for qname, sql in sorted(oracle.items()):
        try:
            spark_rel = con.execute(f"SELECT * FROM read_parquet('{outdir}/{qname}.parquet')")
            spark_cols = [d[0] for d in spark_rel.description]
            spark_rows = spark_rel.fetchall()
            duck_rel = con.execute(sql)
            duck_cols = [d[0] for d in duck_rel.description]
            duck_rows = duck_rel.fetchall()
            rec = {
                "rows_match": len(spark_rows) == len(duck_rows),
                "schema_match": sorted(c.lower() for c in spark_cols)
                == sorted(c.lower() for c in duck_cols),
                "hash_match": row_hash(spark_cols, spark_rows) == row_hash(duck_cols, duck_rows),
                "err": None,
            }
            if not all((rec["rows_match"], rec["schema_match"], rec["hash_match"])):
                rec["detail"] = {
                    "spark_n": len(spark_rows),
                    "duck_n": len(duck_rows),
                    "spark_cols": spark_cols,
                    "duck_cols": duck_cols,
                    "spark_head": [[norm(v) for v in r] for r in spark_rows[:3]],
                    "duck_head": [[norm(v) for v in r] for r in duck_rows[:3]],
                }
            results[qname] = rec
        except Exception as e:  # noqa: BLE001 - report, don't crash the sweep
            results[qname] = {
                "rows_match": False,
                "schema_match": False,
                "hash_match": False,
                "err": str(e)[:300],
            }

    # Rows-only queries (no SQL oracle): assert non-empty output exists.
    for p in sorted(glob.glob(f"{outdir}/*.parquet")):
        qname = os.path.basename(p).replace(".parquet", "")
        if qname in results:
            continue
        try:
            n = con.execute(f"SELECT count(*) FROM read_parquet('{p}')").fetchone()[0]
            results[qname] = {"rows_only": True, "rows": n, "nonempty": n > 0, "err": None}
        except Exception as e:  # noqa: BLE001
            results[qname] = {"rows_only": True, "rows": 0, "nonempty": False, "err": str(e)[:300]}

    oracle_ok = sum(
        1
        for r in results.values()
        if not r.get("rows_only") and r["rows_match"] and r["schema_match"] and r["hash_match"]
    )
    oracle_n = sum(1 for r in results.values() if not r.get("rows_only"))
    rows_ok = sum(1 for r in results.values() if r.get("rows_only") and r["nonempty"])
    rows_n = sum(1 for r in results.values() if r.get("rows_only"))

    report = {
        "outdir": outdir,
        "sfdir": sfdir,
        "oracle_pass": oracle_ok,
        "oracle_total": oracle_n,
        "rows_only_nonempty": rows_ok,
        "rows_only_total": rows_n,
        "queries": results,
    }
    with open(report_path, "w") as f:
        json.dump(report, f, indent=1, sort_keys=True)
    print(f"ORACLE {oracle_ok}/{oracle_n} ROWS-ONLY {rows_ok}/{rows_n} -> {report_path}")
    for qname, r in sorted(results.items()):
        bad = (not r.get("rows_only") and not (r["rows_match"] and r["schema_match"] and r["hash_match"])) or (
            r.get("rows_only") and not r["nonempty"]
        )
        if bad:
            print("FAIL", qname, json.dumps(r)[:500])
    sys.exit(0 if oracle_ok == oracle_n else 1)


if __name__ == "__main__":
    main()
