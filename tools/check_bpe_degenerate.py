#!/usr/bin/env python3
"""End-to-end regression check for the BPE oracle's exhaustion path
(VERDICT r13, Next round #4): when training exhausts before round 4,
bpeRoundSql's LEFT JOIN must degrade the missing rounds to NO-OPS —
keeping the last real segmentation — instead of collapsing s_r to zero
rows (a CROSS JOIN against an empty m_r would). The ScalaTest side
(BpeTrainSpec "degenerate corpus") pins the Spark half; this script
pins the DuckDB half by actually running both engines on a corpus that
exhausts at 3/4 merges and diffing the results, exactly like the
driver's correctness gate.

Usage: python3 tools/check_bpe_degenerate.py
Builds /tmp/bpe_degen/documents.parquet ({"a b", "a b", "c"} → merges
(a,</w>) (b,</w>) (c,</w>) then exhaustion), runs
`sbt runMain graft.Verify /tmp/bpe_degen ... q_bpe_train,q_bpe_encode`,
then tools/compare_oracle.py. Exit 0 iff both queries hash-match.
"""
import os
import subprocess
import sys

import duckdb

DIR = "/tmp/bpe_degen"
OUT = "/tmp/bpe_degen_out"


def main():
    os.makedirs(DIR, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"""
        COPY (
          SELECT * FROM (VALUES
            (0::BIGINT, 'a b', 'en', 'fixture', 3::BIGINT),
            (1::BIGINT, 'a b', 'en', 'fixture', 3::BIGINT),
            (2::BIGINT, 'c',   'en', 'fixture', 1::BIGINT)
          ) t(doc_id, text, lang, source, n_chars)
        ) TO '{DIR}/documents.parquet' (FORMAT PARQUET)
    """)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        ["sbt", "-batch",
         f"runMain graft.Verify {DIR} {OUT} q_bpe_train,q_bpe_encode"],
        cwd=repo, capture_output=True, text=True)
    if r.returncode != 0:
        print(r.stdout[-2000:], r.stderr[-1000:])
        sys.exit(1)
    c = subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "compare_oracle.py"),
         DIR, OUT],
        capture_output=True, text=True)
    print(c.stdout.strip())
    ok = c.returncode == 0 and "0 fail" in c.stdout and "2 pass" in c.stdout
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
