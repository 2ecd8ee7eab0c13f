#!/usr/bin/env python3
"""Generate the K-times scaled EVENTS table for ScaleCurve legs of the
temporal/windowed family (events_window, sessionize, lag_features).

Usage: python3 tools/gen_scaledevents.py [K] [baseDir] [outDir]

K copies with user_id remapped per copy (user_id + k*1e6) and event_id
offset; ts is untouched. Per-user event density — the thing session
gaps, lags, and window widths key on — is preserved per copy, so a Kx
corpus carries Kx the users and Kx the mass per time window: the honest
load shape for a windowed/sessionized scaling curve (more concurrent
users, not a stretched clock).
"""
import sys
import os
import duckdb

k = int(sys.argv[1]) if len(sys.argv) > 1 else 100
base = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
out = sys.argv[3] if len(sys.argv) > 3 else "/root/repo/scaledata/sf10"

os.makedirs(out, exist_ok=True)
duckdb.sql(f"""
COPY (
  SELECT event_id + k*100000000 AS event_id, ts,
         user_id + k*1000000 AS user_id,
         event_type, value, props
  FROM '{base}/events.parquet', (SELECT unnest(range({k})) AS k)
  ORDER BY event_id
) TO '{out}/events.parquet' (FORMAT PARQUET)
""")
n = duckdb.sql(f"SELECT count(*) FROM '{out}/events.parquet'").fetchone()[0]
print(f"{out}/events.parquet: {n} events ({k} copies of {base})")
