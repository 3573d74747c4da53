#!/usr/bin/env python3
"""Generate a deterministic 10x `events` table (sf1, 1,000,000 rows) at
/tmp/sf1/events.parquet so the relational/window/stream families get a
measured decade like the dedup/text/embedding families (PLANS.md
round-10 section).

Recipe mirrors the driver's OWN sf0.01 -> sf0.1 scaling, measured from
the testdata: 10x rows AND 10x users (per-user event count stays ~67),
identical 30-day span, uniform event-type mix, value ~ uniform 2-dp,
props = {"k": <0..99>}, timestamps random within the span and sorted
(event_id = sort rank). Written as naive timestamp[us], matching the
round-10 driver regeneration (rounds <=9 wrote TIMESTAMP(NANOS); both
physical types are normalized by `Tables.events`/`Streams.eventsStream`,
so either works — us keeps the decade's two endpoints type-identical).

Usage: python3 tools/gen_sf1_events.py [outdir] (default /tmp/sf1)
"""
import random
import sys

import pyarrow as pa
import pyarrow.parquet as pq

N_ROWS = 1_000_000
N_USERS = 15_000
TYPES = ['view', 'click', 'signup', 'purchase', 'error']
SPAN_NS = 30 * 24 * 3600 * 10**9          # 30 days
T0_NS = 1_704_067_200 * 10**9             # 2024-01-01T00:00:00Z


def main(outdir: str) -> None:
    rng = random.Random(42)
    ts = sorted(T0_NS + rng.randrange(SPAN_NS) for _ in range(N_ROWS))
    tbl = pa.table({
        'event_id': pa.array(range(N_ROWS), pa.int64()),
        'ts': pa.array([t // 1000 for t in ts], pa.timestamp('us')),
        'user_id': pa.array([rng.randrange(N_USERS) for _ in range(N_ROWS)], pa.int64()),
        'event_type': pa.array([TYPES[rng.randrange(5)] for _ in range(N_ROWS)], pa.string()),
        'value': pa.array([round(rng.uniform(0, 500), 2) for _ in range(N_ROWS)], pa.float64()),
        'props': pa.array(['{"k": %d}' % rng.randrange(100) for _ in range(N_ROWS)], pa.string()),
    })
    import os
    os.makedirs(outdir, exist_ok=True)
    pq.write_table(tbl, f'{outdir}/events.parquet')
    print(f'wrote {N_ROWS} events to {outdir}/events.parquet')


if __name__ == '__main__':
    main(sys.argv[1] if len(sys.argv) > 1 else '/tmp/sf1')
