#!/usr/bin/env python3
"""Generate a deterministic 10x `documents` table (sf1, 50,000 rows) at
/tmp/sf1/documents.parquet for the dedup-family scaling datapoint
(PLANS.md round-9 section; VERDICT r8 next-steps #6).

The driver's testdata is read-only and stops at sf0.1, so the decade
measurement needs a locally generated corpus. Recipe mirrors the
observed sf0.1 distribution (31-token vocabulary, uniform 10..100
token lengths, 5 langs at the observed mix, 20 sources) with explicit
dup injection so the banded operators have real work:
  - ~5% of docs are NEAR-DUPS of an earlier doc (same text minus the
    last token, plus one fresh token) — enough shared shingles to be
    LSH candidates;
  - ~1.5% are EXACT copies of an earlier doc.
Seeded (42): identical output across runs. Single parquet file via one
pyarrow write (q_stream_neardup's AvailableNow source assumes one file
per directory).

Usage: python3 tools/gen_sf1_documents.py [outdir] (default /tmp/sf1)
"""
import random
import sys

import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = ['a', 'agg', 'batch', 'big', 'column', 'customer', 'data', 'dup',
         'fast', 'filter', 'group', 'hash', 'join', 'key', 'line', 'merge',
         'order', 'part', 'query', 'row', 'scan', 'slow', 'small', 'sort',
         'spark', 'stream', 'table', 'the', 'value', 'vector', 'window']
LANGS = ['en', 'en', 'zh', 'es', 'fr', 'de']  # en at ~2x the others
N_DOCS = 50_000


def main(outdir: str) -> None:
    rng = random.Random(42)
    texts = []
    for i in range(N_DOCS):
        if i > 100 and i % 64 == 3:            # exact dup of an earlier doc
            texts.append(texts[rng.randrange(0, i - 1)])
        elif i > 100 and i % 20 == 7:          # near-dup: drop last, add one
            base = texts[rng.randrange(0, i - 1)].split()
            texts.append(' '.join(base[:-1] + [rng.choice(VOCAB)]))
        else:
            n = rng.randint(10, 100)
            texts.append(' '.join(rng.choice(VOCAB) for _ in range(n)))
    tbl = pa.table({
        'doc_id': pa.array(range(N_DOCS), pa.int64()),
        'text': pa.array(texts, pa.string()),
        'lang': pa.array([LANGS[rng.randrange(len(LANGS))] for _ in range(N_DOCS)], pa.string()),
        'source': pa.array([f'src{rng.randrange(20)}' for _ in range(N_DOCS)], pa.string()),
        'n_chars': pa.array([len(t) for t in texts], pa.int64()),
    })
    import os
    os.makedirs(outdir, exist_ok=True)
    pq.write_table(tbl, f'{outdir}/documents.parquet')
    print(f'wrote {N_DOCS} docs to {outdir}/documents.parquet')


if __name__ == '__main__':
    main(sys.argv[1] if len(sys.argv) > 1 else '/tmp/sf1')
