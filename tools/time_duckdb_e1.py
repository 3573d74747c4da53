#!/usr/bin/env python3
"""DuckDB side of the E1 flagship matched pair.

Restates `TrainingPipeline.featureTable` (reference shape: borough-keyed
windows) plus the bench's final per-(borough, is_event) aggregate as one
DuckDB query over the parquet fixtures dumped by `runMain graft.E1Fixtures
<dir> <nHours> <rowsPerHour>`:

    dedup -> safe numeric Vol -> fan-out join on (Yr,M,D,HH)
    -> borough-keyed lag/rolling windows (ties broken on date, RequestID)
    -> cyclical + holiday + heavy-snow features -> na.drop
    -> GROUP BY borough, is_event

Same relations, same operator inventory, full materialization
(fetchall), per-rep seconds printed as one JSON line — symmetric to
Bench.scala's flagship_e1 protocol (the Spark side also generates the
fixture inside the measured region; that arithmetic is ~2% of wall and
identical work for both engines is what matters, not zero work).

Usage: python3 tools/time_duckdb_e1.py <fixtureDir> [reps]
"""
import json
import statistics
import sys
import time

import duckdb

SQL = """
WITH t_raw AS (SELECT DISTINCT * FROM traffic),
t AS (SELECT RequestID, Yr, M, D, HH, Boro AS borough_t, SegmentID,
             TRY_CAST(Vol AS DOUBLE) AS Vol
      FROM t_raw),
w AS (SELECT year(date) AS Yr, month(date) AS M, day(date) AS D,
             hour(date) AS HH, date, borough,
             temperature_2m, precipitation, snowfall, snow_depth
      FROM weather),
j AS (SELECT t.*, w.date, w.borough, w.temperature_2m, w.precipitation,
             w.snowfall, w.snow_depth
      FROM t JOIN w USING (Yr, M, D, HH)),
win AS (SELECT *,
        lag(Vol) OVER w1 AS vol_lag_1,
        avg(Vol) OVER (w1 ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING)
          AS vol_roll_3,
        avg(Vol) OVER (w1 ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
          AS vol_roll_24
        FROM j
        WINDOW w1 AS (PARTITION BY borough ORDER BY date, RequestID)),
feat AS (SELECT *,
        sin(hour(date) * 2*pi()/24) AS hour_sin,
        cos(hour(date) * 2*pi()/24) AS hour_cos,
        sin((isodow(date) - 1) * 2*pi()/7) AS wd_sin,
        cos((isodow(date) - 1) * 2*pi()/7) AS wd_cos,
        sin(month(date) * 2*pi()/12) AS month_sin,
        cos(month(date) * 2*pi()/12) AS month_cos,
        CASE WHEN h.holiday_date IS NOT NULL THEN 1 ELSE 0 END AS is_holiday,
        CASE WHEN snow_depth > 5 THEN 1 ELSE 0 END AS heavy_snow,
        ln(1 + Vol) AS vol_log
        FROM win LEFT JOIN holidays h ON CAST(win.date AS DATE) = h.holiday_date),
ev AS (SELECT *,
       CASE WHEN is_holiday = 1 OR coalesce(heavy_snow, 0) = 1
            THEN 1 ELSE 0 END AS is_event
       FROM feat),
clean AS (SELECT * FROM ev
          WHERE hour_sin IS NOT NULL AND hour_cos IS NOT NULL
            AND wd_sin IS NOT NULL AND wd_cos IS NOT NULL
            AND month_sin IS NOT NULL AND month_cos IS NOT NULL
            AND temperature_2m IS NOT NULL AND precipitation IS NOT NULL
            AND snowfall IS NOT NULL
            AND vol_lag_1 IS NOT NULL AND vol_roll_3 IS NOT NULL
            AND vol_roll_24 IS NOT NULL AND vol_log IS NOT NULL)
SELECT borough, is_event, CAST(count(*) AS BIGINT) AS n,
       avg(Vol) AS avg_vol, avg(vol_roll_24) AS avg_roll_24
FROM clean GROUP BY borough, is_event
"""


def main():
    fixture_dir = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    con = duckdb.connect()
    con.execute("SET threads TO 32")
    for t in ("traffic", "weather", "holidays"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{fixture_dir}/{t}.parquet/*.parquet')")
    times, rows = [], None
    for _ in range(reps):
        t0 = time.perf_counter()
        rows = con.execute(SQL).fetchall()
        times.append(time.perf_counter() - t0)
    print(json.dumps({
        "metric": "duckdb_e1",
        "value": statistics.median(times),
        "unit": "sec",
        "raw": times,
        "result_rows": len(rows),
        "joined_rows_check": int(sum(r[2] for r in rows)),
        "fixture": fixture_dir,
    }))


if __name__ == "__main__":
    main()
