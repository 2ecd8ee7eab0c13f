#!/usr/bin/env python3
"""Refresh BASELINE.md's per-query table from BENCH_FULL.json.

The warm/cold columns are taken VERBATIM from one dual-mode Bench run
(the committed artifact), replacing the old practice of hand-merging
minima across windows; the duckdb column (single-thread oracle timings)
is preserved from the existing table. Queries new to the artifact get
'n/a' for duckdb unless a row already exists.
"""
import json
import re

bench = json.load(open("BENCH_FULL.json"))
warm, cold = bench["queries"], bench["queries_cold"]

lines = open("BASELINE.md", encoding="utf-8").read().splitlines(keepends=True)
out = []
duck = {}
# warm/cold cells may read n/a (e.g. a query that errored in one mode)
row_re = re.compile(r"\| (\w+) \| (?:[\d.]+|n/a) \| (?:[\d.]+|n/a) \| ([\d.]+|n/a) \|")
for ln in lines:
    m = row_re.match(ln)
    if m:
        duck[m.group(1)] = m.group(2)

table_written = False
i = 0
while i < len(lines):
    ln = lines[i]
    if row_re.match(ln):
        if not table_written:
            for q in sorted(set(warm) | set(cold)):
                # a query can fail in one mode only — keep the other's cell
                w = f"{warm[q]:.2f}" if q in warm else "n/a"
                c = f"{cold[q]:.2f}" if q in cold else "n/a"
                out.append(f"| {q} | {w} | {c} | "
                           f"{duck.get(q, 'n/a')} |\n")
            table_written = True
        # skip the old row
    else:
        out.append(ln)
    i += 1

open("BASELINE.md", "w", encoding="utf-8").write("".join(out))
print(f"rewrote {len(warm)} rows; warm total {bench['value']}s, "
      f"cold total {bench['total_cold']}s")
