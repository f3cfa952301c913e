#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate (dev tool only — the
shipped library has no Python dependency).

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <name>/ parquet written by graft.Verify, runs the matching
oracle_sql.json query in DuckDB over the same parquet tables, sorts columns
by name and rows by value, and compares exactly.
"""
import json
import sys

import duckdb
import pyarrow.parquet as pq
import pyarrow.dataset as pds


def canon(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = []
    for r in rows:
        out.append(tuple(r[i] for i in order))
    out.sort(key=lambda t: tuple((v is None, str(v)) for v in t))
    return [colnames[i] for i in order], out


def fresh_con(sf_dir):
    con = duckdb.connect()
    for tbl in ["region", "nation", "customer", "supplier", "part", "orders",
                "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {tbl} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{tbl}.parquet')")
    return con


def main(sf_dir, out_dir, json_out=None):
    # version skew between this box's DuckDB and the driver's is a live
    # suspect whenever local-pass/driver-fail divergence appears (r6 DSIR)
    print(f"duckdb {duckdb.__version__}")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    report = {}
    con = fresh_con(sf_dir)
    n_since = 0
    for name, sql in sorted(oracle.items()):
        # recycle the connection every 25 queries: a single DuckDB 1.0
        # connection accumulates allocator state across 200+ heavy
        # MATERIALIZED-CTE queries until tiny allocations fail (observed
        # round 7: 3 spurious OOM "FAIL"s that all pass standalone)
        n_since += 1
        if n_since > 25:
            con.close()
            con = fresh_con(sf_dir)
            n_since = 1
        try:
            got_tbl = pds.dataset(f"{out_dir}/{name}").to_table()
            got_cols = got_tbl.column_names
            got_rows = [tuple(r.values()) for r in got_tbl.to_pylist()]
            exp = con.execute(sql)
            exp_cols = [d[0] for d in exp.description]
            exp_rows = exp.fetchall()
        except Exception as e:
            print(f"FAIL {name}: exception {e}")
            report[name] = {"rows_match": None, "schema_match": None,
                            "values_match": None, "err": str(e)[:300]}
            n_fail += 1
            continue
        gc, gr = canon(got_rows, got_cols)
        ec, er = canon(exp_rows, exp_cols)
        report[name] = {"rows_match": len(gr) == len(er),
                        "schema_match": gc == ec,
                        "values_match": gr == er,
                        "spark_rows": len(gr), "oracle_rows": len(er),
                        "err": None}
        if gc != ec:
            print(f"FAIL {name}: schema {gc} != {ec}")
            n_fail += 1
        elif gr != er:
            n_fail += 1
            print(f"FAIL {name}: {len(gr)} vs {len(er)} rows")
            for a, b in list(zip(gr, er))[:200]:
                if a != b:
                    print(f"   got {a}\n   exp {b}")
                    break
            if len(gr) != len(er):
                only_g = set(map(str, gr)) - set(map(str, er))
                only_e = set(map(str, er)) - set(map(str, gr))
                print(f"   only-got {list(only_g)[:3]}")
                print(f"   only-exp {list(only_e)[:3]}")
        else:
            n_pass += 1
            print(f"PASS {name} ({len(gr)} rows)")
    print(f"== {n_pass} pass / {n_fail} fail ==")
    if json_out:
        with open(json_out, "w") as f:
            json.dump(report, f, indent=1, sort_keys=True)
    return 1 if n_fail else 0


if __name__ == "__main__":
    jo = None
    argv = sys.argv[1:]
    if "--json" in argv:
        i = argv.index("--json")
        jo = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    sys.exit(main(argv[0], argv[1], jo))
