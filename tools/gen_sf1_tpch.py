#!/usr/bin/env python3
"""Generate deterministic 10x TPC-H-ish tables (sf1) at /tmp/sf1 so the
lineitem/orders/geo query families get a measured decade like the
dedup/text/embedding/events families (PLANS.md round-10 sections).

Recipe mirrors the driver's OWN sf0.01 -> sf0.1 scaling, measured from
the testdata (every column is an INDEPENDENT uniform draw — verified:
corr(l_extendedprice, l_quantity) = 0.001, lines-per-order matches
Binomial(N_LI, 1/N_ORD) ~= Poisson(4) including the ~1.8% of orders with
no lineitems, l_linenumber uniform 1..7 independent of the order):
  - 10x rows for lineitem/orders/customer/supplier/part,
    10x key spaces (l_orderkey 0..1.5M-1, l_partkey 0..200k-1, ...);
  - nation/region fixed (25/5 rows) — copied verbatim from sf0.1;
  - identical value ranges and category mixes: quantity int-valued
    1..50, extendedprice unif(900, 105000) 2dp, discount 0..0.10 2dp
    (11 distinct), tax 0..0.08 2dp (9 distinct), shipdate uniform days
    over 1995-01-01+[0,2500), orderdate over +[0,2405), timestamp[ms];
  - names follow the observed patterns (Customer#%09d, 8x8 adj+noun
    p_name vocabulary, Brand#1..25, 6 p_type values).
Seeded (42): identical output across runs. One parquet file per table.

Usage: python3 tools/gen_sf1_tpch.py [outdir] (default /tmp/sf1)
"""
import os
import random
import shutil
import sys

import pyarrow as pa
import pyarrow.parquet as pq

N_LI, N_ORD, N_CUST, N_SUPP, N_PART = 6_000_000, 1_500_000, 150_000, 10_000, 200_000
T0_MS = 788_918_400_000  # 1995-01-01T00:00:00Z
DAY_MS = 86_400_000
ADJ = ['blue', 'cold', 'hot', 'large', 'new', 'old', 'red', 'small']
NOUN = ['anvil', 'bolt', 'gear', 'gizmo', 'plate', 'ring', 'rod', 'widget']
SEGMENTS = ['AUTOMOBILE', 'BUILDING', 'FURNITURE', 'HOUSEHOLD', 'MACHINERY']
PTYPES = ['ECONOMY', 'LARGE', 'MEDIUM', 'PROMO', 'SMALL', 'STANDARD']
PRIOS = ['1-URGENT', '2-HIGH', '3-MEDIUM', '4-NOT SPECIFIED', '5-LOW']


def write(outdir, name, tbl):
    pq.write_table(tbl, f'{outdir}/{name}.parquet')
    print(f'wrote {tbl.num_rows} rows to {outdir}/{name}.parquet')


def main(outdir: str) -> None:
    os.makedirs(outdir, exist_ok=True)
    rng = random.Random(42)

    write(outdir, 'customer', pa.table({
        'c_custkey': pa.array(range(N_CUST), pa.int64()),
        'c_name': pa.array(['Customer#%09d' % i for i in range(N_CUST)], pa.string()),
        'c_nationkey': pa.array([rng.randrange(25) for _ in range(N_CUST)], pa.int32()),
        'c_acctbal': pa.array([round(rng.uniform(-1000, 10000), 2) for _ in range(N_CUST)], pa.float64()),
        'c_mktsegment': pa.array([rng.choice(SEGMENTS) for _ in range(N_CUST)], pa.string()),
    }))

    write(outdir, 'supplier', pa.table({
        's_suppkey': pa.array(range(N_SUPP), pa.int64()),
        's_name': pa.array(['Supplier#%09d' % i for i in range(N_SUPP)], pa.string()),
        's_nationkey': pa.array([rng.randrange(25) for _ in range(N_SUPP)], pa.int32()),
        's_acctbal': pa.array([round(rng.uniform(-1000, 10000), 2) for _ in range(N_SUPP)], pa.float64()),
    }))

    write(outdir, 'part', pa.table({
        'p_partkey': pa.array(range(N_PART), pa.int64()),
        'p_name': pa.array([f'{rng.choice(ADJ)} {rng.choice(NOUN)}' for _ in range(N_PART)], pa.string()),
        'p_brand': pa.array(['Brand#%d' % (rng.randrange(25) + 1) for _ in range(N_PART)], pa.string()),
        'p_type': pa.array([rng.choice(PTYPES) for _ in range(N_PART)], pa.string()),
        'p_size': pa.array([rng.randrange(1, 51) for _ in range(N_PART)], pa.int32()),
        'p_retailprice': pa.array([round(rng.uniform(900, 1000), 1) for _ in range(N_PART)], pa.float64()),
    }))

    write(outdir, 'orders', pa.table({
        'o_orderkey': pa.array(range(N_ORD), pa.int64()),
        'o_custkey': pa.array([rng.randrange(N_CUST) for _ in range(N_ORD)], pa.int64()),
        'o_orderstatus': pa.array([rng.choice('FOP') for _ in range(N_ORD)], pa.string()),
        'o_totalprice': pa.array([round(rng.uniform(1000, 500000), 2) for _ in range(N_ORD)], pa.float64()),
        'o_orderdate': pa.array([T0_MS + rng.randrange(2405) * DAY_MS for _ in range(N_ORD)], pa.timestamp('ms')),
        'o_orderpriority': pa.array([rng.choice(PRIOS) for _ in range(N_ORD)], pa.string()),
    }))

    write(outdir, 'lineitem', pa.table({
        'l_orderkey': pa.array([rng.randrange(N_ORD) for _ in range(N_LI)], pa.int64()),
        'l_partkey': pa.array([rng.randrange(N_PART) for _ in range(N_LI)], pa.int64()),
        'l_suppkey': pa.array([rng.randrange(N_SUPP) for _ in range(N_LI)], pa.int64()),
        'l_linenumber': pa.array([rng.randrange(1, 8) for _ in range(N_LI)], pa.int32()),
        'l_quantity': pa.array([float(rng.randrange(1, 51)) for _ in range(N_LI)], pa.float64()),
        'l_extendedprice': pa.array([round(rng.uniform(900, 105000), 2) for _ in range(N_LI)], pa.float64()),
        'l_discount': pa.array([round(rng.randrange(11) * 0.01, 2) for _ in range(N_LI)], pa.float64()),
        'l_tax': pa.array([round(rng.randrange(9) * 0.01, 2) for _ in range(N_LI)], pa.float64()),
        'l_returnflag': pa.array([rng.choice('ANR') for _ in range(N_LI)], pa.string()),
        'l_linestatus': pa.array([rng.choice('FO') for _ in range(N_LI)], pa.string()),
        'l_shipdate': pa.array([T0_MS + rng.randrange(2500) * DAY_MS for _ in range(N_LI)], pa.timestamp('ms')),
    }))

    for small in ('nation', 'region'):
        shutil.copy(f'/root/testdata/sf0.1/{small}.parquet', f'{outdir}/{small}.parquet')
        print(f'copied {small}.parquet from sf0.1 (fixed-size dimension)')


if __name__ == '__main__':
    main(sys.argv[1] if len(sys.argv) > 1 else '/tmp/sf1')
