#!/usr/bin/env python3
"""Scale-factor amplifier for the driver-generated testdata (driver-side
tooling only — not part of the shipped library).

Replicates every table `factor` times with structure-preserving key
offsets so the engine + its DuckDB oracles can be validated at sf1-like
volume without a driver regeneration:

  - every surrogate key gets `replica * STRIDE` added (STRIDE is a
    multiple of 1000, so `id % k` slice predicates keep their classes
    and FK joins stay consistent within a replica);
  - document text is word-tagged per replica (`word~i`), which keeps
    each replica's internal near-dup structure bit-identical while
    making CROSS-replica Jaccard zero — corpus size grows 10x, the
    near-dup pair set grows 10x (not 100x quadratic explosion);
  - embeddings are circularly rotated per replica (cosine structure
    within a replica preserved exactly; cross-replica cosines decay to
    noise), so ANN/dedup contracts scale without duplicate-pair blowup;
  - events.ts passes through with its source physical type unchanged
    (nanos in older generations, micros in newer — graft.Tables.load
    and CdcStream.readEvents dispatch on whichever arrives).

Usage: python3 tools/scale_up.py <src_sf_dir> <out_dir> <factor>
"""
import sys, os, shutil
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import duckdb

src, out, factor = sys.argv[1], sys.argv[2], int(sys.argv[3])
STRIDE = 1_000_000_000  # far above any base key; multiple of 1000
os.makedirs(out, exist_ok=True)

KEY_OFFSETS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
}

def amplify_arrow(name, keys):
    t = pq.read_table(f"{src}/{name}.parquet")
    parts = []
    for i in range(factor):
        r = t
        for k in keys:
            col = r.column(k)
            off = pa.scalar(i * STRIDE, type=col.type)
            r = r.set_column(r.schema.get_field_index(k), k, pc.add(col, off))
        parts.append(r)
    merged = pa.concat_tables(parts)
    # version 2.6 passes timestamp physical types through unchanged
    pq.write_table(merged, f"{out}/{name}.parquet", version="2.6")
    print(f"{name}: {t.num_rows} -> {merged.num_rows}")

for name, keys in KEY_OFFSETS.items():
    amplify_arrow(name, keys)

for name in ("region", "nation"):  # dims don't scale
    shutil.copyfile(f"{src}/{name}.parquet", f"{out}/{name}.parquet")
    print(f"{name}: copied")

con = duckdb.connect()
reps = ", ".join(str(i) for i in range(factor))

# documents: word-tag text per replica (replica 0 untouched);
# n_chars recomputed to stay consistent with the tagged text
con.execute(f"""
  COPY (
    SELECT doc_id + CAST(r AS BIGINT) * {STRIDE} AS doc_id,
           CASE WHEN r = 0 THEN text
                ELSE array_to_string(
                       list_transform(string_split(text, ' '),
                                      w -> w || '~' || r), ' ')
           END AS text,
           lang, source,
           CAST(length(CASE WHEN r = 0 THEN text
                ELSE array_to_string(
                       list_transform(string_split(text, ' '),
                                      w -> w || '~' || r), ' ')
           END) AS BIGINT) AS n_chars
    FROM '{src}/documents.parquet', unnest([{reps}]) AS t(r)
  ) TO '{out}/documents.parquet' (FORMAT PARQUET)
""")
print("documents: scaled with per-replica word tags")

# embeddings: circular dim rotation per replica (64 dims; rotate by 7*r)
con.execute(f"""
  COPY (
    SELECT vec_id + CAST(r AS BIGINT) * {STRIDE} AS vec_id,
           CASE WHEN r = 0 THEN embedding
                ELSE list_concat(embedding[(7*r) % 64 + 1:],
                                 embedding[1:(7*r) % 64])
           END AS embedding,
           label
    FROM '{src}/embeddings.parquet', unnest([{reps}]) AS t(r)
  ) TO '{out}/embeddings.parquet' (FORMAT PARQUET)
""")
print("embeddings: scaled with per-replica rotation")

for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    n = con.sql(f"SELECT count(*) FROM '{out}/{t}.parquet'").fetchone()[0]
    print(f"  {t}: {n}")
print("done")
