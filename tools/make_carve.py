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

Usage: make_carve.py <srcSfDir> <k> <outDir> [--skew FRAC] [--full]

--skew FRAC (VERDICT r9 item 4) additionally makes the carve
DELIBERATELY SKEWED: one hot key carries ~FRAC of the rows on the two
join/group keys the heavy families shuffle on — events.user_id (stream
joins, sessionizers, per-user aggregates) is reassigned to the min
user for event_id % round(1/FRAC) == 0, and lineitem.l_suppkey
(supplier join/agg families) to the min supplier for
l_orderkey % round(1/FRAC) == 0 (whole orders, so multi-row orders
stay internally consistent). Everything stays oracle-checkable: the
DuckDB oracle reads the same skewed parquet, so tools/check.py gates
the skewed run exactly like a normal one.
"""
import os
import sys

import duckdb

src, k, out = sys.argv[1], int(sys.argv[2]), sys.argv[3]
skew = None
full = False
tables = None
args = sys.argv[4:]
while args:
    if args[0] == "--skew":
        skew = float(args[1])
        assert 0.0 < skew <= 0.5, "--skew FRAC must be in (0, 0.5]"
        args = args[2:]
    elif args[0] == "--full":
        full = True
        args = args[1:]
    elif args[0] == "--tables":
        # Carve ONLY the named fact tables, symlink the rest (VERDICT
        # r12 item 3): a x100 carve of the whole catalog is pointless
        # when the measurement targets five queries over three tables —
        # the subset keeps build time and disk at the tables under test.
        tables = set(args[1].split(","))
        bad = tables - {"events", "orders", "lineitem", "documents",
                        "embeddings"}
        assert not bad, f"--tables: unknown carveable tables {sorted(bad)}"
        args = args[2:]
    else:
        raise AssertionError(f"unknown flag {args[0]}")
assert not (skew and full), "--skew and --full are separate carve kinds"
assert tables is None or full, "--tables requires --full"
os.makedirs(out, exist_ok=True)


def want(t):
    return tables is None or t in tables

n, u, umin = duckdb.sql(
    f"SELECT max(event_id) + 1, max(user_id) + 1, min(user_id) "
    f"FROM '{src}/events.parquet'"
).fetchone()
copies = ",".join(f"({i})" for i in range(k))
mod = round(1 / skew) if skew else 0
user_expr = (
    f"CASE WHEN event_id % {mod} = 0 THEN CAST({umin} AS BIGINT) "
    f"ELSE user_id + i * {u} END" if skew else f"user_id + i * {u}")
if want("events"):
    duckdb.sql(f"""
      COPY (
        SELECT event_id + i * {n} AS event_id, ts,
               {user_expr} AS user_id, event_type, value, props
        FROM read_parquet('{src}/events.parquet')
        CROSS JOIN (VALUES {copies}) t(i)
        ORDER BY event_id
      ) TO '{out}/events.parquet' (FORMAT PARQUET)
    """)

if skew:
    smin = duckdb.sql(
        f"SELECT min(l_suppkey) FROM '{src}/lineitem.parquet'").fetchone()[0]
    duckdb.sql(f"""
      COPY (
        SELECT l_orderkey, l_partkey,
               CASE WHEN l_orderkey % {mod} = 0
                 THEN CAST({smin} AS BIGINT) ELSE l_suppkey END AS l_suppkey,
               l_linenumber, l_quantity, l_extendedprice, l_discount,
               l_tax, l_returnflag, l_linestatus, l_shipdate
        FROM read_parquet('{src}/lineitem.parquet')
        ORDER BY l_orderkey, l_linenumber
      ) TO '{out}/lineitem.parquet' (FORMAT PARQUET)
    """)

if full:
    # --full (VERDICT r10 item 2): the scale-exponent carve. Fact tables
    # grow k-fold with DIMENSIONS FIXED — the realistic 100-TB growth
    # mode (more orders/lineitems/docs against the same customer/part/
    # supplier catalog). Order keys shift by i*(max+1) so lineitem's FK
    # chases its copied order; per-order lineitem fans stay identical
    # (each copied order keeps exactly its own lineitems), so queries
    # whose cost is "per order" scale linearly by construction and any
    # super-linear timing is the OPERATOR's, not the fixture's.
    okmax = duckdb.sql(
        f"SELECT max(o_orderkey) + 1 FROM '{src}/orders.parquet'").fetchone()[0]
    if want("orders"):
        duckdb.sql(f"""
      COPY (
        SELECT o_orderkey + i * {okmax} AS o_orderkey, o_custkey,
               o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        FROM read_parquet('{src}/orders.parquet')
        CROSS JOIN (VALUES {copies}) t(i)
        ORDER BY o_orderkey
      ) TO '{out}/orders.parquet' (FORMAT PARQUET)
    """)
    if want("lineitem"):
        duckdb.sql(f"""
      COPY (
        SELECT l_orderkey + i * {okmax} AS l_orderkey, l_partkey, l_suppkey,
               l_linenumber, l_quantity, l_extendedprice, l_discount,
               l_tax, l_returnflag, l_linestatus, l_shipdate
        FROM read_parquet('{src}/lineitem.parquet')
        CROSS JOIN (VALUES {copies}) t(i)
        ORDER BY l_orderkey, l_linenumber
      ) TO '{out}/lineitem.parquet' (FORMAT PARQUET)
    """)
    dmax = duckdb.sql(
        f"SELECT max(doc_id) + 1 FROM '{src}/documents.parquet'").fetchone()[0]
    # Doc text PERTURBS while scaling (VERDICT r11 item 2 — verbatim
    # copies would manufacture k^2 LSH bucket fans no real corpus has):
    # per copy i>0, ~30% of tokens are replaced by a SAME-LENGTH
    # deterministic scramble keyed by (token, i). Keyed by token — not
    # doc — so any two docs inside copy i transform identically and the
    # copy's INTERNAL near-dup structure is exactly the original's,
    # while cross-copy 3-gram shingle survival is 0.7^3 = 0.34 (Jaccard
    # ~0.2, below every LSH band threshold): each copy is a parallel
    # corpus, not a duplicate. Same-length replacements keep n_chars
    # and all length/quality statistics identical.
    if want("documents"):
        duckdb.sql(f"""
      COPY (
        SELECT doc_id + i * {dmax} AS doc_id,
               CASE WHEN i = 0 THEN text ELSE
                 array_to_string(
                   list_transform(string_split(text, ' '),
                     t -> CASE WHEN length(t) <= 128
                                AND hash(t || ':' || i) % 10 < 3
                          THEN substr(repeat(md5(t || ':' || i), 4),
                                      1, length(t))
                          ELSE t END),
                   ' ')
               END AS text,
               lang, source, n_chars
        FROM read_parquet('{src}/documents.parquet')
        CROSS JOIN (VALUES {copies}) cp(i)
        ORDER BY doc_id
      ) TO '{out}/documents.parquet' (FORMAT PARQUET)
    """)
    # Embeddings scale the same way: copies JITTER by a deterministic
    # per-(vec,dim,copy) uniform offset in [-0.12, 0.12] (vs dim
    # variance ~0.014), so cross-copy cosine lands ~0.85-0.9 — below
    # exact/near-dup thresholds, inside the label cluster geometry:
    # new points from the same distribution, not clones.
    vmax = duckdb.sql(
        f"SELECT max(vec_id) + 1 FROM '{src}/embeddings.parquet'").fetchone()[0]
    if want("embeddings"):
        duckdb.sql(f"""
      COPY (
        SELECT vec_id + i * {vmax} AS vec_id,
               CASE WHEN i = 0 THEN embedding ELSE
                 CAST(list_transform(embedding, (x, d) ->
                   x + (CAST(hash(vec_id * 1000003 + d * 131 + i) % 2001
                             AS BIGINT) - 1000) * 0.00012)
                   AS FLOAT[])
               END AS embedding,
               label
        FROM read_parquet('{src}/embeddings.parquet')
        CROSS JOIN (VALUES {copies}) cp(i)
        ORDER BY vec_id
      ) TO '{out}/embeddings.parquet' (FORMAT PARQUET)
    """)

for t in ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "documents", "embeddings", "events"):
    dst = f"{out}/{t}.parquet"
    if not os.path.exists(dst):
        os.symlink(f"{src}/{t}.parquet", dst)

rows = duckdb.sql(f"SELECT count(*) FROM '{out}/events.parquet'").fetchone()[0]
if full and k > 1 and want("documents") and want("embeddings"):
    # carve-quality readout: cross-copy similarity must sit BELOW
    # dedup thresholds or the scale measurement is measuring the
    # carve's own degeneracy, not the operator
    tok = duckdb.sql(f"""
      WITH a AS (SELECT doc_id, string_split(text, ' ') AS t
                 FROM '{out}/documents.parquet' WHERE doc_id < 50),
           b AS (SELECT doc_id - {dmax} AS doc_id, string_split(text, ' ') AS t
                 FROM '{out}/documents.parquet'
                 WHERE doc_id >= {dmax} AND doc_id < {dmax} + 50)
      SELECT avg(CAST(len(list_filter(a.t, (x, j) -> x = b.t[j])) AS DOUBLE)
                 / len(a.t))
      FROM a JOIN b USING (doc_id)
    """).fetchone()[0]
    cos = duckdb.sql(f"""
      WITH a AS (SELECT vec_id, embedding e FROM '{out}/embeddings.parquet'
                 WHERE vec_id < 100),
           b AS (SELECT vec_id - {vmax} AS vec_id, embedding e
                 FROM '{out}/embeddings.parquet'
                 WHERE vec_id >= {vmax} AND vec_id < {vmax} + 100)
      SELECT avg(list_dot_product(a.e, b.e) /
                 sqrt(list_dot_product(a.e, a.e) * list_dot_product(b.e, b.e)))
      FROM a JOIN b USING (vec_id)
    """).fetchone()[0]
    print(f"perturbation: cross-copy token keep-rate {tok:.3f} "
          f"(shingle-3 survival ~{tok**3:.3f}), cross-copy cosine {cos:.3f}")
if skew:
    hot = duckdb.sql(
        f"SELECT count(*) FILTER (user_id = {umin}) * 1000 // count(*) "
        f"FROM '{out}/events.parquet'").fetchone()[0]
    print(f"carve ready: {out} events={rows} (k={k} from {src}, "
          f"skew: hot user carries {hot}permille)")
else:
    print(f"carve ready: {out} events={rows} (k={k} from {src})")
