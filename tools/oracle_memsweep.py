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
full-battery version (run per round before committing).

Parallel by default (r15, the check_oracle.py treatment): the cap is
PER CONNECTION and each query gets a fresh one, so workers don't share
a budget and the per-query verdict is identical to the serial sweep —
8 workers cut the full battery ~20min -> ~3min. --workers 1 is the
legacy serial path. SLOW timings are stamped with the worker count:
under concurrency they measure contention too, so compare slow-lists
only at equal worker counts.

Usage: python3 tools/oracle_memsweep.py <sfDir> <verifyOutDir> \
           [cap] [--workers N]
Expect: "FAILS: 0".
"""
import json
import multiprocessing as mp
import os
import sys
import time

from check_oracle import fresh_con  # shared table list + view setup

_SF = _CAP = None


def _init(sf, cap):
    global _SF, _CAP
    _SF, _CAP = sf, cap


def _sweep_one(item):
    name, sql = item
    con = fresh_con(_SF)
    con.execute(f"SET memory_limit='{_CAP}'")
    # per-PROCESS spill dir: DuckDB names temp files inside
    # temp_directory and removes them on close — concurrent workers
    # sharing one dir could clobber each other's spills into exactly
    # the spurious-FAIL class this tool exists to rule out
    con.execute(f"SET temp_directory='/tmp/duck_spill_{os.getpid()}'")
    t0 = time.time()
    try:
        con.execute(sql).fetchall()
        return name, None, time.time() - t0
    except Exception as e:
        return name, str(e)[:160], time.time() - t0
    finally:
        con.close()


def main(sf, outdir, cap="200MB", workers=None):
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    items = sorted(oracle.items())
    if workers is None:
        workers = min(8, os.cpu_count() or 1)
    fails, slow = [], []

    def consume(res):
        name, err, dt = res
        if err is not None:
            fails.append((name, err))
        elif dt > 5:
            slow.append((name, round(dt, 1)))

    if workers <= 1:
        _init(sf, cap)
        for it in items:
            consume(_sweep_one(it))
    else:
        with mp.get_context("fork").Pool(
                workers, initializer=_init, initargs=(sf, cap)) as pool:
            for res in pool.imap(_sweep_one, items):
                consume(res)
    print("FAILS:", len(fails))
    for n, e in fails:
        print(" ", n, "--", e)
    print(f"SLOW(>5s under cap at workers={workers}, spill/contention-"
          f"bound — informational):", slow)
    return 1 if fails else 0


if __name__ == "__main__":
    argv = sys.argv[1:]
    nw = None
    if "--workers" in argv:
        i = argv.index("--workers")
        nw = int(argv[i + 1])
        argv = argv[:i] + argv[i + 2:]
    if not 2 <= len(argv) <= 3:
        print(__doc__)
        sys.exit(2)
    sys.exit(main(*argv, workers=nw))
