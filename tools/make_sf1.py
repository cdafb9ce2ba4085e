#!/usr/bin/env python3
"""Synthesize an sf1-scale dataset (10x sf0.1) for the scale measurement
the judge asked for (VERDICT r7 #3), since the driver only ships
sf{0.001,0.01,0.1}.

Scaling model: CONSTANT DENSITY, the way TPC-H itself scales — each of
the 10 replicas shifts its dates by i*2530 days, so the derived interval
coordinate span grows 10x while per-coordinate interval density stays
sf0.1-like (pair counts grow ~10x, not 100x). Keys are offset per
replica (consistently between lineitem and orders) so ids stay unique;
document tokens are salted per replica so cross-replica shingle sharing
is zero and the near-dup pair structure replicates rather than
explodes. customer's derived coords are (custkey*37)%2400 by fixture
design, so the closest-probe side densifies within the base span —
noted in COVERAGE.md.

Usage: python3 tools/make_sf1.py [outdir]   (default /tmp/sf1)
"""
import sys, shutil, os
import duckdb

src = "/root/testdata/sf0.1"
out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
os.makedirs(out, exist_ok=True)
con = duckdb.connect()
con.execute("SET threads TO 16")

K = con.execute(
    f"SELECT max(o_orderkey) + 1 FROM '{src}/orders.parquet'").fetchone()[0]
C = con.execute(
    f"SELECT max(c_custkey) + 1 FROM '{src}/customer.parquet'").fetchone()[0]
D = con.execute(
    f"SELECT max(doc_id) + 1 FROM '{src}/documents.parquet'").fetchone()[0]

con.execute(f"""
COPY (
  SELECT l_orderkey + i * {K} AS l_orderkey, l_partkey, l_suppkey,
         l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
         l_returnflag, l_linestatus,
         l_shipdate + to_days(CAST(i * 2530 AS INT)) AS l_shipdate
  FROM '{src}/lineitem.parquet' CROSS JOIN range(10) t(i)
) TO '{out}/lineitem.parquet' (FORMAT PARQUET)""")

con.execute(f"""
COPY (
  SELECT o_orderkey + i * {K} AS o_orderkey, o_custkey + i * {C} AS o_custkey,
         o_orderstatus, o_totalprice,
         o_orderdate + to_days(CAST(i * 2530 AS INT)) AS o_orderdate,
         o_orderpriority
  FROM '{src}/orders.parquet' CROSS JOIN range(10) t(i)
) TO '{out}/orders.parquet' (FORMAT PARQUET)""")

con.execute(f"""
COPY (
  SELECT c_custkey + i * {C} AS c_custkey, c_name, c_nationkey, c_acctbal,
         c_mktsegment
  FROM '{src}/customer.parquet' CROSS JOIN range(10) t(i)
) TO '{out}/customer.parquet' (FORMAT PARQUET)""")

con.execute(f"""
COPY (
  SELECT doc_id + i * {D} AS doc_id,
         regexp_replace(text, '(\\S+)', 'r' || i || '\\1', 'g') AS text,
         lang, source,
         CAST(strlen(regexp_replace(text, '(\\S+)', 'r' || i || '\\1', 'g'))
           AS BIGINT) AS n_chars
  FROM '{src}/documents.parquet' CROSS JOIN range(10) t(i)
) TO '{out}/documents.parquet' (FORMAT PARQUET)""")

# events: 10 replicas, each shifted past the previous replica's time span
# and onto a fresh user-id range, so the session/window structure
# replicates (10x sessions, same per-session shape) instead of densifying
# one timeline.
E, U = con.execute(f"""
    SELECT max(event_id) + 1, max(user_id) + 1
    FROM '{src}/events.parquet'""").fetchone()
span_days = con.execute(f"""
    SELECT CAST(ceil(date_diff('day', min(ts), max(ts))) AS BIGINT) + 1
    FROM '{src}/events.parquet'""").fetchone()[0]
con.execute(f"""
COPY (
  SELECT event_id + i * {E} AS event_id,
         ts + to_days(CAST(i * {span_days} AS INT)) AS ts,
         user_id + i * {U} AS user_id,
         event_type, value, props
  FROM '{src}/events.parquet' CROSS JOIN range(10) t(i)
) TO '{out}/events.parquet' (FORMAT PARQUET)""")

# embeddings: 10 replicas with the vector dimensions cyclically rotated
# by the replica index — a rotation is an isometry, so every replica's
# intra-replica cosine/L2 structure (near-dup pairs, kNN graph, cluster
# shape) is EXACTLY the base set's, while cross-replica pairs decorrelate.
# ANN/dedup answer sets therefore replicate 10x rather than explode.
ndim = con.execute(f"""
    SELECT len(embedding) FROM '{src}/embeddings.parquet' LIMIT 1""").fetchone()[0]
V = con.execute(f"""
    SELECT max(vec_id) + 1 FROM '{src}/embeddings.parquet'""").fetchone()[0]
con.execute(f"""
COPY (
  SELECT vec_id + i * {V} AS vec_id,
         CAST(list_concat(embedding[i + 1:{ndim}], embedding[1:i])
              AS FLOAT[]) AS embedding,
         label
  FROM '{src}/embeddings.parquet' CROSS JOIN range(10) t(i)
) TO '{out}/embeddings.parquet' (FORMAT PARQUET)""")

# dimension tables: copied through unscaled (TPC-H scales these sub-linearly;
# every consumer treats them as broadcast-sized)
for t in ("region", "nation", "supplier", "part"):
    p = f"{src}/{t}.parquet"
    if os.path.exists(p):
        shutil.copy(p, f"{out}/{t}.parquet")

for t in ("lineitem", "orders", "customer", "documents", "events",
          "embeddings"):
    n = con.execute(f"SELECT count(*) FROM '{out}/{t}.parquet'").fetchone()[0]
    print(t, n)
