#!/usr/bin/env python3
"""sf1 per-query floor adjudication (VERDICT r17, Next round #5).

139/213 queries read >2x DuckDB individually at sf1 while the suite
total reads 0.474x. The hypothesis: Spark's fixed per-lane cost
(job scheduling, AQE stage planning, noop-sink setup, stream
start/stop + checkpoint I/O) dominates sub-second lanes, and DuckDB's
per-query floor is ~milliseconds. This tool MEASURES each lane's floor
instead of modeling it: the same Bench harness run at sf0.001 (~1/1000
of sf1 data, same plans, same rep protocol) prices the lane's fixed
cost with a near-zero data term.

Classification per >2x-at-sf1 query:
    data_sf1 = spark_sf1 - floor_q        (the lane's actual data work)
    floor-dominated  if data_sf1 <= max(2 * duck_sf1, 0.25s)
        -- the data term itself meets the BASELINE 2x contract; the
           ratio is arithmetic of a fixed floor over a tiny denominator
    real             otherwise -- needs an explanation or a fix

A "real" data term is then adjudicated on the measured DECADE
(sf0.1 -> sf1, BENCH_r17_local2.json vs BENCH_r17_sf1.json): a plan
pathology (quadratic join, serialization point) shows super-linear
growth across 10x data; growth <= 13x (10x + window slack) with a >2x
ratio is the engine's per-row/per-stage constant factor on small data
-- the same constant factor that INVERTS in Spark's favor on the
suite's heavy tail (0.474x total). Final classes:
    floor        -- fixed lane cost explains the ratio
    linear       -- data term real but decade-linear: constant factor,
                    not a plan defect; nothing to fix at 100 TB (scale
                    helps these rows, as the suite total proves)
    SUPERLINEAR  -- decade growth > 13x: a genuine scale-killer, fix it

Inputs:  BENCH_r17_sf1.json  DUCK_r17_sf1.json  BENCH_floor_r18.json
         BENCH_r17_local2.json (sf0.1 decade base)
Output:  markdown table (stdout) for PLANS.md + FLOOR_MODEL_r18.json
"""
import json
import sys

REPO = "/root/repo/"


def main() -> None:
    bench = json.load(open(REPO + "BENCH_r17_sf1.json"))
    duck = json.load(open(REPO + "DUCK_r17_sf1.json"))
    floor = json.load(open(REPO + sys.argv[1] if len(sys.argv) > 1 else REPO + "BENCH_floor_r18.json"))
    sf01 = json.load(open(REPO + "BENCH_r17_local2.json"))["queries"]
    bq, dq = bench["queries"], duck["queries"]
    # floor estimate = MIN of the lane's raw sf0.001 reps: the floor run's
    # window was degraded (suite-edge chase 1516/1373 ms vs the committed
    # 800 ms healthy floor), and min-of-reps is the standard noise-robust
    # statistic when a window is bursty -- a minimum can only OVERSTATE
    # the true floor by whatever degradation persisted through all reps,
    # and an overstated floor shrinks the data term, so any "real"
    # classification below survives the correction direction that matters
    fq = {k: min(v) for k, v in floor["raw"].items() if v}

    rows = []
    for q in sorted(dq):
        if q not in bq or q not in fq:
            continue
        s, d, f = bq[q], dq[q], fq[q]
        if d <= 0 or s / d <= 2.0:
            continue
        data = max(0.0, s - f)
        base01 = sf01.get(q)
        decade = s / base01 if base01 is not None and base01 > 0 else None
        if data <= max(2 * d, 0.25):
            cls = "floor"
        elif decade is None:
            # no positive sf0.1 baseline for this lane: a SUPERLINEAR
            # verdict needs decade EVIDENCE -- flag the gap, don't invent
            # a measured pathology
            cls = "no-decade-datapoint"
        elif decade <= 13.0:
            cls = "linear"
        else:
            cls = "SUPERLINEAR"
        rows.append((q, s, d, s / d, f, data, decade, cls))

    order = {"SUPERLINEAR": 0, "no-decade-datapoint": 1, "linear": 2, "floor": 3}
    rows.sort(key=lambda r: (order[r[7]], -r[5]))
    n_super = sum(1 for r in rows if r[7] == "SUPERLINEAR")
    n_lin = sum(1 for r in rows if r[7] == "linear")
    print("| query | spark sf1 | duck sf1 | ratio | floor (sf0.001) | data term | decade (sf0.1->sf1) | class |")
    print("|---|---|---|---|---|---|---|---|")
    for q, s, d, r, f, data, decade, cls in rows:
        dec = f"{decade:.1f}x" if decade is not None else "n/a"
        print(f"| {q} | {s:.2f} | {d:.2f} | {r:.1f}x | {f:.2f} | {data:.2f} | {dec} | {cls} |")
    print(f"\n{len(rows)} rows >2x with a measured floor: {n_super} SUPERLINEAR, "
          f"{n_lin} linear, {len(rows) - n_super - n_lin} floor-dominated.")

    out = {
        "model": "data_sf1 = spark_sf1 - floor(min of sf0.001 same-lane raw reps); "
                 "floor iff data_sf1 <= max(2*duck_sf1, 0.25); else linear iff "
                 "decade growth (sf0.1->sf1) <= 13x; else SUPERLINEAR",
        "floor_file": floor.get("sf", "?"),
        "n_gt2x_with_floor": len(rows),
        "n_superlinear": n_super,
        "n_linear": n_lin,
        "rows": [
            {"query": q, "spark_sf1": s, "duck_sf1": d, "ratio": round(r, 2),
             "floor_sf0001": f, "data_term": round(data, 3),
             "decade": round(decade, 2) if decade is not None else None,
             "class": cls}
            for q, s, d, r, f, data, decade, cls in rows
        ],
    }
    json.dump(out, open(REPO + "FLOOR_MODEL_r18.json", "w"), indent=1)
    print("wrote FLOOR_MODEL_r18.json", file=sys.stderr)


if __name__ == "__main__":
    main()
