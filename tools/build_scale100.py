"""Build a 100x stress replica of the sf0.1 corpus tables in
/tmp/scale100 (one decade past the r05/r06 10x recipe): documents
500k, embeddings 200k, events 10M.

Replica salting: document TEXT is content-perturbed per replica
(translate 'e'/'a' to replica-indexed letters for r>0) so replicas are
NOT near-duplicates of each other — otherwise every doc gains 99 exact
copies and pair-generating dedup operators measure a C(100,2)
duplicate-explosion artifact instead of operator scaling.  Original
internal duplicate structure is preserved within each replica (same
salt => same transform).  Embeddings get a tiny deterministic per-
replica rotation-free shift on one dimension so exact-duplicate vector
groups stay bounded; events get shifted ids (100x distinct users)."""
import shutil, duckdb, os, string
src = "/root/testdata/sf0.1"
dst = "/tmp/scale100"
os.makedirs(dst, exist_ok=True)
con = duckdb.connect()
con.execute(f"""
COPY (
  SELECT event_id + r * 10000000 AS event_id, ts,
         user_id + r * 1000000 AS user_id, event_type, value, props
  FROM read_parquet('{src}/events.parquet'), range(100) t(r)
) TO '{dst}/events.parquet' (FORMAT parquet)
""")
# per-replica letter map: r=0 identity; r>0 translate two frequent
# letters to distinct targets so shingle sets diverge across replicas
cases = " ".join(
    f"WHEN r = {r} THEN translate(text, 'ea', '{string.ascii_lowercase[r % 26]}{string.ascii_lowercase[(r * 7 + 3) % 26]}')"
    for r in range(1, 100)
)
con.execute(f"""
COPY (
  SELECT doc_id + r * 10000000 AS doc_id,
         CASE WHEN r = 0 THEN text {cases} END AS text,
         lang, source, n_chars
  FROM read_parquet('{src}/documents.parquet'), range(100) t(r)
) TO '{dst}/documents.parquet' (FORMAT parquet)
""")
con.execute(f"""
COPY (
  SELECT vec_id + r * 10000000 AS vec_id,
         list_transform(embedding, x -> x + r * 0.0003) AS embedding,
         label
  FROM read_parquet('{src}/embeddings.parquet'), range(100) t(r)
) TO '{dst}/embeddings.parquet' (FORMAT parquet)
""")
for t in ("region","nation","customer","supplier","part","orders","lineitem"):
    shutil.copy(f"{src}/{t}.parquet", f"{dst}/{t}.parquet")
con.execute(f"SELECT count(*) c FROM read_parquet('{dst}/documents.parquet')")
print("docs:", con.fetchall())
print("built", dst)
