#!/usr/bin/env python3
"""Time every oracle SQL in DuckDB with FULL result materialization
(fetchall), symmetric to the Spark bench's noop-sink full evaluation.

Usage: python3 tools/time_duckdb.py <sfDir> [oracle_sql.json] [reps]

Prints one JSON line {"total": sec, "queries": {name: sec}} using the
per-query MEDIAN of `reps` runs (default 3, first-run compile above the
median), matching Bench.scala's protocol.

NOTE: a query that errors on ANY rep appears only in "errors" and is
excluded from "queries"/"total" — any Spark-vs-DuckDB ratio must be
computed over the per-query JOIN of both engines' "queries" maps, never
the two totals, or the engines silently compare different query sets.
"""
import json, os, statistics, sys, threading, time

import duckdb

# Per-query wall clamp (seconds): at sf1 a pathological oracle (quadratic
# self-join) could otherwise hang the whole matched-pair window. An
# interrupted query is recorded in "errors" like any other failure and
# excluded from the ratio join. Override with DUCK_QUERY_TIMEOUT.
QUERY_TIMEOUT = float(os.environ.get("DUCK_QUERY_TIMEOUT", "300"))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def main():
    sf_dir = sys.argv[1]
    oracle_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out/oracle_sql.json"
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    con = duckdb.connect()
    con.execute(f"SET threads TO 32")
    for t in TABLES:
        # locally-generated decade dirs (/tmp/sf1) carry only the tables
        # their bench family reads — skip absent ones (a query touching
        # a missing table then errors per-query, which is the honest
        # outcome, instead of failing the whole run at setup)
        if not os.path.exists(os.path.join(sf_dir, f"{t}.parquet")):
            continue
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracles = json.load(open(oracle_path))
    out, errs = {}, {}
    for name, sql in sorted(oracles.items()):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            # watchdog: duckdb honors Connection.interrupt() from another
            # thread; the interrupted execute() raises and lands in errs
            timer = threading.Timer(QUERY_TIMEOUT, con.interrupt)
            timer.start()
            try:
                con.execute(sql).fetchall()  # full materialization
                ts.append(time.perf_counter() - t0)
            except Exception as e:  # noqa: BLE001
                # keep attempting remaining reps (Bench.scala protocol):
                # a single flaky rep must not leave a lone cold first-run
                # time standing in as this query's "median"
                errs.setdefault(name, str(e)[:200])
                if time.perf_counter() - t0 >= QUERY_TIMEOUT:
                    break  # timed out — don't burn reps x timeout more wall
            finally:
                timer.cancel()
        # a query that errored on ANY rep is reported in errors only —
        # a partial-rep median would silently skew the suite total the
        # Spark/DuckDB ratio is computed against
        if ts and name not in errs:
            out[name] = statistics.median(ts)
    line = {"total": sum(out.values()), "queries": out, "errors": errs,
            "sf": sf_dir, "reps": reps}
    print(json.dumps(line))


if __name__ == "__main__":
    main()
