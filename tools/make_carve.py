#!/usr/bin/env python3
"""Build a k-times-larger events carve from an existing sf dir, for
spot-verifying the watermark-calibrated streaming oracles at a scale the
driver never ships (VERDICT r7 item 8).

Construction: k copies of events with event_id shifted by i*(max+1) and
user_id shifted by i*(umax+1) — ids stay dense (the chunk-displacement
arithmetic in the disorder fixtures keys on max(event_id)), per-user row
counts stay linear (the stream-join pair sets scale ~k, not k^2), and the
event-time distribution triples in density over the same range. Every
other table is symlinked unchanged so tools/check.py can resolve the full
oracle catalog.

Usage: make_carve.py <srcSfDir> <k> <outDir>
"""
import os
import sys

import duckdb

src, k, out = sys.argv[1], int(sys.argv[2]), sys.argv[3]
os.makedirs(out, exist_ok=True)

n, u = duckdb.sql(
    f"SELECT max(event_id) + 1, max(user_id) + 1 FROM '{src}/events.parquet'"
).fetchone()
copies = ",".join(f"({i})" for i in range(k))
duckdb.sql(f"""
  COPY (
    SELECT event_id + i * {n} AS event_id, ts,
           user_id + i * {u} AS user_id, event_type, value, props
    FROM read_parquet('{src}/events.parquet')
    CROSS JOIN (VALUES {copies}) t(i)
    ORDER BY event_id
  ) TO '{out}/events.parquet' (FORMAT PARQUET)
""")

for t in ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "documents", "embeddings"):
    dst = f"{out}/{t}.parquet"
    if not os.path.exists(dst):
        os.symlink(f"{src}/{t}.parquet", dst)

rows = duckdb.sql(f"SELECT count(*) FROM '{out}/events.parquet'").fetchone()[0]
print(f"carve ready: {out} events={rows} (k={k} from {src})")
