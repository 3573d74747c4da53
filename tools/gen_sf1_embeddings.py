#!/usr/bin/env python3
"""Generate a deterministic 10x `embeddings` table (sf1, 20,000 rows) at
/tmp/sf1/embeddings.parquet so the embedding/ANN operator family gets
the same measured-decade treatment as the dedup family (PLANS.md
round-10 section; r9 verdict graded decade evidence over extrapolation).

Recipe mirrors the observed sf0.1 distribution: 64-dim unit-norm float
vectors, 10 labels with near-uniform counts, vectors clustered around
a per-label direction (cosine structure for centroid/ANN ops to find),
plus ~3% NEAR-DUP vectors (an earlier vector nudged by eps and
renormalized — inside the q_embedding_neardup cosine threshold) so
near-dup and semantic-dedup ops have real work at scale. Seeded (7):
identical output across runs. Single parquet file, list<float32>
column, matching the driver testdata's schema exactly.

Usage: python3 tools/gen_sf1_embeddings.py [outdir] (default /tmp/sf1)
"""
import math
import random
import sys

import pyarrow as pa
import pyarrow.parquet as pq

N_VECS = 20_000
DIM = 64
N_LABELS = 10


def normalize(v):
    n = math.sqrt(sum(x * x for x in v)) or 1.0
    return [x / n for x in v]


def main(outdir: str) -> None:
    rng = random.Random(7)
    centroids = [normalize([rng.gauss(0, 1) for _ in range(DIM)])
                 for _ in range(N_LABELS)]
    vecs, labels = [], []
    for i in range(N_VECS):
        if i > 100 and i % 32 == 5:            # near-dup of an earlier vector
            j = rng.randrange(0, i - 1)
            v = normalize([x + rng.gauss(0, 0.01) for x in vecs[j]])
            vecs.append(v)
            labels.append(labels[j])
        else:
            lab = rng.randrange(N_LABELS)
            c = centroids[lab]
            # 2:1 signal-to-noise keeps clusters separable but overlapping,
            # like the sf0.1 fixture (intra-label cosine well above inter).
            v = normalize([2.0 * c[d] + rng.gauss(0, 1) for d in range(DIM)])
            vecs.append(v)
            labels.append(lab)
    tbl = pa.table({
        'vec_id': pa.array(range(N_VECS), pa.int64()),
        'embedding': pa.array(
            [[float(f'{x:.8g}') for x in v] for v in vecs],
            pa.list_(pa.float32())),
        'label': pa.array(labels, pa.int32()),
    })
    import os
    os.makedirs(outdir, exist_ok=True)
    pq.write_table(tbl, f'{outdir}/embeddings.parquet')
    print(f'wrote {N_VECS} vectors to {outdir}/embeddings.parquet')


if __name__ == '__main__':
    main(sys.argv[1] if len(sys.argv) > 1 else '/tmp/sf1')
