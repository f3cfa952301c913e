#!/usr/bin/env python3
"""Battery-wide DuckDB peak-memory sweep (dev tool only).

Executes EVERY oracle in <verifyOutDir>/oracle_sql.json over the
<sfDir> parquet tables under a hard memory cap (default 200MB) with a
spill directory, one FRESH connection per query so a single hog can't
hide behind allocator reuse. The round-11 driver environment OOM'd
four alphabetically-consecutive oracles under ambient memory pressure;
a query that passes this sweep has a bounded peak and survives that
class of window. OracleParseSpec tier 3 runs the MATERIALIZED-CTE
members under the same cap inside `sbt test`; this sweep is the
full-battery version (minutes, run per round before committing).

Usage: python3 tools/oracle_memsweep.py <sfDir> <verifyOutDir> [cap]
Expect: "FAILS: 0".
"""
import json
import sys
import time

from check_oracle import fresh_con  # shared table list + view setup


def main(sf, outdir, cap="200MB"):
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    fails, slow = [], []
    for name, sql in sorted(oracle.items()):
        con = fresh_con(sf)
        con.execute(f"SET memory_limit='{cap}'")
        con.execute("SET temp_directory='/tmp/duck_spill'")
        t0 = time.time()
        try:
            con.execute(sql).fetchall()
            dt = time.time() - t0
            if dt > 5:
                slow.append((name, round(dt, 1)))
        except Exception as e:
            fails.append((name, str(e)[:160]))
        con.close()
    print("FAILS:", len(fails))
    for n, e in fails:
        print(" ", n, "--", e)
    print("SLOW(>5s under cap, spill-bound — informational):", slow)
    return 1 if fails else 0


if __name__ == "__main__":
    if not 3 <= len(sys.argv) <= 4:
        print(__doc__)
        sys.exit(2)
    sys.exit(main(*sys.argv[1:]))
