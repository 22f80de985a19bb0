"""Build a 100x stress replica of the sf0.1 corpus tables in
/tmp/scale100 (one decade past the r05/r06 10x recipe): documents
500k, embeddings 200k, events 10M, and (r08) the TPC-H fact/dim chain
at 100x with key-shifted replicas: lineitem 60M, orders 15M,
customer 1.5M, part 2M, supplier 100k.

Replica salting: document TEXT is content-perturbed per replica
(translate 'e'/'a' to replica-indexed letters for r>0) so replicas are
NOT near-duplicates of each other — otherwise every doc gains 99 exact
copies and pair-generating dedup operators measure a C(100,2)
duplicate-explosion artifact instead of operator scaling.  Original
internal duplicate structure is preserved within each replica (same
salt => same transform).  Embeddings get a tiny deterministic per-
replica rotation-free shift on one dimension so exact-duplicate vector
groups stay bounded; events get shifted ids (100x distinct users).

TPC-H replication (r08, for the unpinned-broadcast stress sweep —
VERDICT r07 item 7): every key is shifted by r * (next power of 10
above its sf0.1 max), consistently across referencing tables, so join
cardinalities scale faithfully: 100x customers/parts/suppliers/orders,
each order keeps its original lineitems within its replica.
nation/region stay bounded — they are the deliberately-KEPT broadcast
pin class and must not scale.  Non-key attributes (brand, dates,
prices) are untouched, so bounded-domain aggregates (brand/date grain)
stay bounded-domain with 100x rows per group — exactly the shape the
kept-pin policy assumes."""
import shutil, duckdb, os, string, sys
src = "/root/testdata/sf0.1"
# optional: replica count and destination (default 100x at /tmp/scale100;
# a 10x build at /tmp/scale10 is the ratio-test replica for separating
# heavy-linear from super-linear operators, where 100x times out any cap)
REPL = int(sys.argv[1]) if len(sys.argv) > 1 else 100
dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/scale100"
os.makedirs(dst, exist_ok=True)
con = duckdb.connect()
con.execute(f"""
COPY (
  SELECT event_id + r * 10000000 AS event_id, ts,
         user_id + r * 1000000 AS user_id, event_type, value, props
  FROM read_parquet('{src}/events.parquet'), range({REPL}) t(r)
) TO '{dst}/events.parquet' (FORMAT parquet)
""")
# per-replica letter map: r=0 identity; r>0 translate two frequent
# letters to distinct targets so shingle sets diverge across replicas
cases = " ".join(
    f"WHEN r = {r} THEN translate(text, 'ea', '{string.ascii_lowercase[r % 26]}{string.ascii_lowercase[(r * 7 + 3) % 26]}')"
    for r in range(1, REPL)
)
con.execute(f"""
COPY (
  SELECT doc_id + r * 10000000 AS doc_id,
         CASE WHEN r = 0 THEN text {cases} END AS text,
         lang, source, n_chars
  FROM read_parquet('{src}/documents.parquet'), range({REPL}) t(r)
) TO '{dst}/documents.parquet' (FORMAT parquet)
""")
con.execute(f"""
COPY (
  SELECT vec_id + r * 10000000 AS vec_id,
         list_transform(embedding, x -> x + r * 0.0003) AS embedding,
         label
  FROM read_parquet('{src}/embeddings.parquet'), range({REPL}) t(r)
) TO '{dst}/embeddings.parquet' (FORMAT parquet)
""")
# TPC-H chain: key offsets = next power of 10 above the sf0.1 max
# (o_orderkey < 150k, c_custkey < 15k, p_partkey < 20k, s_suppkey < 1k)
OFF_O, OFF_C, OFF_P, OFF_S = 10**6, 10**5, 10**5, 10**4
con.execute(f"""
COPY (
  SELECT c_custkey + r * {OFF_C} AS c_custkey,
         c_name, c_nationkey, c_acctbal, c_mktsegment
  FROM read_parquet('{src}/customer.parquet'), range({REPL}) t(r)
) TO '{dst}/customer.parquet' (FORMAT parquet)
""")
con.execute(f"""
COPY (
  SELECT s_suppkey + r * {OFF_S} AS s_suppkey,
         s_name, s_nationkey, s_acctbal
  FROM read_parquet('{src}/supplier.parquet'), range({REPL}) t(r)
) TO '{dst}/supplier.parquet' (FORMAT parquet)
""")
con.execute(f"""
COPY (
  SELECT p_partkey + r * {OFF_P} AS p_partkey,
         p_name, p_brand, p_type, p_size, p_retailprice
  FROM read_parquet('{src}/part.parquet'), range({REPL}) t(r)
) TO '{dst}/part.parquet' (FORMAT parquet)
""")
con.execute(f"""
COPY (
  SELECT o_orderkey + r * {OFF_O} AS o_orderkey,
         o_custkey + r * {OFF_C} AS o_custkey,
         o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
  FROM read_parquet('{src}/orders.parquet'), range({REPL}) t(r)
) TO '{dst}/orders.parquet' (FORMAT parquet)
""")
con.execute(f"""
COPY (
  SELECT l_orderkey + r * {OFF_O} AS l_orderkey,
         l_partkey + r * {OFF_P} AS l_partkey,
         l_suppkey + r * {OFF_S} AS l_suppkey,
         l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
         l_returnflag, l_linestatus, l_shipdate
  FROM read_parquet('{src}/lineitem.parquet'), range({REPL}) t(r)
) TO '{dst}/lineitem.parquet' (FORMAT parquet)
""")
for t in ("region", "nation"):
    shutil.copy(f"{src}/{t}.parquet", f"{dst}/{t}.parquet")
for t in ("documents", "lineitem"):
    con.execute(f"SELECT count(*) FROM read_parquet('{dst}/{t}.parquet')")
    print(t, con.fetchall())
print("built", dst)
