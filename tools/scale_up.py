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
  - embeddings: replica r applies an exact isometry — circular
    rotation by (7r mod 64) COMPOSED with a seeded per-replica ±1
    sign-flip pattern. Within a replica every inner product equals
    the base corpus up to FP summation order (≤1 double ulp: sign
    flips cancel in products, rotation only permutes the sum), so
    ANN/dedup recall contracts transfer; cross-replica cosines decay
    to noise (measured ~5e-4 of cross pairs land above τ=0.4 — same
    statistics the validated rotation scheme had at ≤10×). The
    sign-flip leg is what kills the pure-rotation scheme's period-64
    artifact (replica 64 used to be bit-identical to replica 0, a
    generator artifact that excluded the embedding family from the
    100x pack — VERDICT r7 #1): seeded patterns never repeat.
  - events.ts passes through with its source physical type unchanged
    (nanos in older generations, micros in newer — graft.Tables.load
    and CdcStream.readEvents dispatch on whichever arrives).
  - --zipf-users (events only): instead of giving every replica its
    own user population (distinct users grow linearly, counts stay
    flat — at 100x that is 150k flat users, which pushes the topK
    sketch past its 32k exact capacity with no heavy hitters above
    the error line), replicas share user populations zipf-style:
    replica r reuses user bucket floor(log2(r+1)). At factor 100 that
    is 7 buckets -> 10.5k distinct users (inside the exact regime of
    both approx_top_k at 32k and topk_weighted at 100k) whose counts
    span a 37:1 heavy-hitter range (bucket 6 spans replicas 63..99).
    ONLY the frequency/top-k entries are meaningful on a skew pack —
    per-user history queries (latest state, funnels, sessionize) see
    merged replica histories by design. Keep skew packs separate.

  - --plant-dups (embeddings only): append a seeded 2% of vectors as
    jittered near-copies at cosine in [0.93, 0.98], dup vec_id =
    orig + STRIDE/2 (inside the replica block). Ground truth for the
    100x embedding-dedup recall check (`dedup_embedding_lsh_planted`):
    the base corpus has no separated near-dup structure, so at 100x
    the tau=0.4 exact pair set is dominated by the random-cosine noise
    tail (~5e-4 of 2e10 pairs) and an all-pairs oracle is infeasible;
    planted pairs at tau=0.9 give a LINEAR id-mapped oracle with a
    ~zero noise floor. Keep planted packs separate from the main pack
    (they perturb centroid/occupancy statistics).

  - --plant-text-dups (documents only): append a seeded 2% of the
    scaled documents (doc_id % 50 = 17 — uniform across replicas) as
    TOKEN-MUTATED near-copies, dup doc_id = orig + STRIDE/2 (the
    embedding DUP_OFF convention), source = 'planted'. Mutation:
    append '~d' to every token at (1-based index + doc_id) % 29 == 0
    — a doc-dependent deterministic grid, so 3-gram shingle Jaccard
    lands ~0.8 for median-length docs, spans [~0.45, 1.0] across the
    10–100-token length range (short docs get 0 mutations → exact
    copies), and both engines can recompute the EXACT pair Jaccard
    LINEARLY via the id-mapped join. Ground truth for the 100x
    n-gram pair-dedup contracts (dedup_ngram/minhash/simhash/
    clusters/survivors/decontaminate planted checks): the flat pack's
    exact pair oracle is a quadratic explode at 500k docs; planted
    pairs give a linear oracle with per-pair exact Jaccard. 'planted'
    source rows are TRAIN docs for decontaminate (eval = src0), so
    plants of src0 docs are known contamination. Keep planted packs
    separate from the main pack (they perturb corpus stats).

Usage: python3 tools/scale_up.py <src_sf_dir> <out_dir> <factor> [--zipf-users] [--plant-dups] [--plant-text-dups]
"""
import sys, os, shutil
import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import duckdb

args = [a for a in sys.argv[1:] if not a.startswith("--")]
flags = {a for a in sys.argv[1:] if a.startswith("--")}
src, out, factor = args[0], args[1], int(args[2])
zipf_users = "--zipf-users" in flags
plant_dups = "--plant-dups" in flags
plant_text = "--plant-text-dups" in flags
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
            if name == "events" and k == "user_id" and zipf_users:
                # zipf-style shared populations: replica i draws from
                # user bucket floor(log2(i+1)) — early buckets are hit
                # by few replicas, the last by ~factor/2, creating
                # genuine heavy hitters at bounded distinct cardinality
                off = pa.scalar(int(np.log2(i + 1)) * STRIDE, type=col.type)
            else:
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
# n_chars recomputed to stay consistent with the tagged text.
# --plant-text-dups additionally appends mutated near-copies (header
# comment) — built FROM the scaled rows so each plant inherits its
# replica's word tags and stays Jaccard-disjoint from other replicas.
# two tiers: HEAVY (~every 29th token mutated, J ~0.8 — the
# jaccard/minhash/cluster regime) and LIGHT (at most ONE token
# mutated, J ~0.9+ — the simhash hamming<=3 regime; docs shorter than
# the chosen position become exact copies, J = 1)
plants_sql = f"""
    SELECT doc_id + {STRIDE // 2} AS doc_id,
           array_to_string(
             list_transform(string_split(text, ' '),
               (w, i) -> CASE WHEN (i + doc_id) % 29 = 0
                              THEN w || '~d' ELSE w END), ' ') AS text,
           lang, 'planted' AS source
    FROM scaled WHERE doc_id % 50 = 17 AND text IS NOT NULL
    UNION ALL
    SELECT doc_id + {STRIDE // 2} AS doc_id,
           array_to_string(
             list_transform(string_split(text, ' '),
               (w, i) -> CASE WHEN i = 1 + (doc_id % 37)
                              THEN w || '~d' ELSE w END), ' ') AS text,
           lang, 'planted' AS source
    FROM scaled WHERE doc_id % 50 = 23 AND text IS NOT NULL
    UNION ALL
    -- CONTAMINATION tier: heavy-mutated copies of ~1/3 of the EVAL
    -- (src0) docs — known train/eval leakage for the decontaminate
    -- contract (the %50 selectors never hit src0: its ids are =0 mod
    -- 10). source='planted' makes the copy a TRAIN doc.
    SELECT doc_id + {STRIDE // 2} AS doc_id,
           array_to_string(
             list_transform(string_split(text, ' '),
               (w, i) -> CASE WHEN (i + doc_id) % 29 = 0
                              THEN w || '~d' ELSE w END), ' ') AS text,
           lang, 'planted' AS source
    FROM scaled WHERE source = 'src0' AND doc_id % 3 = 0
                  AND text IS NOT NULL
""" if plant_text else "SELECT * FROM scaled WHERE false"
con.execute(f"""
  COPY (
    WITH scaled AS (
      SELECT doc_id + CAST(r AS BIGINT) * {STRIDE} AS doc_id,
             CASE WHEN r = 0 THEN text
                  ELSE array_to_string(
                         list_transform(string_split(text, ' '),
                                        w -> w || '~' || r), ' ')
             END AS text,
             lang, source
      FROM '{src}/documents.parquet', unnest([{reps}]) AS t(r)),
    allrows AS (SELECT * FROM scaled UNION ALL {plants_sql})
    SELECT doc_id, text, lang, source,
           CAST(length(text) AS BIGINT) AS n_chars
    FROM allrows
  ) TO '{out}/documents.parquet' (FORMAT PARQUET)
""")
print("documents: scaled with per-replica word tags"
      + (" + planted near-dup copies" if plant_text else ""))

# embeddings: per-replica exact isometry = rotation (7*r mod d) then a
# seeded +-1 sign-flip pattern. Each product term is IEEE-exact under
# both legs ((+-1 x)(+-1 y) = x y; rotation only permutes terms), so
# within-replica inner products equal the base corpus up to FP
# summation order (measured <= 1 double ulp) — same transfer property
# the rotation-only scheme had — and the seeded pattern makes replicas
# non-periodic at any factor (pure rotation repeated at r=64, the
# VERDICT r7 #1 artifact). Replica 0 is the untouched base corpus.
emb_t = pq.read_table(f"{src}/embeddings.parquet")
emb = np.array(emb_t.column("embedding").to_pylist(), dtype=np.float32)
vec_id = emb_t.column("vec_id").to_numpy()
label = emb_t.column("label").to_numpy()
nvec, dim = emb.shape
out_vecs, out_ids, out_labels = [], [], []
for r in range(factor):
    if r == 0:
        v = emb
    else:
        v = np.roll(emb, -((7 * r) % dim), axis=1)
        signs = (np.random.default_rng(20_260_814 + r)
                 .integers(0, 2, size=dim).astype(np.float32) * 2.0 - 1.0)
        v = v * signs  # exact in FP: multiply by +-1.0 flips the sign bit
    out_vecs.append(v)
    out_ids.append(vec_id + r * STRIDE)
    out_labels.append(label)
all_v = np.vstack(out_vecs)
all_ids = np.concatenate(out_ids)
all_labels = np.concatenate(out_labels)
if plant_dups:
    # --plant-dups: append a jittered near-copy of a seeded 2% of each
    # replica's vectors at cosine 1/sqrt(1+eps^2), eps ~ U[0.2, 0.4]
    # => cos in [0.93, 0.98]. The base corpus has NO separated near-dup
    # structure (its tau=0.4 pairs are the tail of the random-cosine
    # distribution at 64 dims, where ~5e-4 of ALL pairs cross 0.4 — at
    # 100x that noise floor is ~1e7 borderline pairs and an exact
    # all-pairs oracle is 2e10 dot products), so the 100x contract for
    # the LSH dedup path is checked ANN-benchmark style: recall over
    # PLANTED ground-truth pairs at tau=0.9, where the random noise
    # floor is ~P(Z >= 0.9/0.125) * 2e10 ~= 0.006 expected pairs (and a
    # 10k-vec all-pairs slice measures zero non-planted pairs >= 0.7).
    # The dup's vec_id = orig + DUP_OFF keeps it inside its replica's
    # STRIDE block, giving the oracle a LINEAR id-mapped join.
    DUP_OFF = STRIDE // 2
    assert vec_id.max() < DUP_OFF, "base vec_id collides with DUP_OFF"
    rng = np.random.default_rng(20_260_815)
    n_all = all_v.shape[0]
    pick = rng.choice(n_all, size=max(1, n_all // 50), replace=False)
    base = all_v[pick].astype(np.float64)
    g = rng.standard_normal(base.shape)
    # orthogonalize the jitter against each vector so the cosine is
    # exactly 1/sqrt(1+eps^2) (up to the float32 round of the result)
    g -= (np.sum(g * base, axis=1, keepdims=True)
          / np.sum(base * base, axis=1, keepdims=True)) * base
    g /= np.linalg.norm(g, axis=1, keepdims=True)
    eps = rng.uniform(0.2, 0.4, size=(base.shape[0], 1))
    nrm = np.linalg.norm(base, axis=1, keepdims=True)
    dup = (base + eps * nrm * g).astype(np.float32)
    all_v = np.vstack([all_v, dup])
    all_ids = np.concatenate([all_ids, all_ids[pick] + DUP_OFF])
    all_labels = np.concatenate([all_labels, all_labels[pick]])
    print(f"embeddings: planted {len(pick)} near-dups at cos~[0.93,0.98]")
emb_field = emb_t.schema.field("embedding")
merged = pa.table({
    "vec_id": pa.array(all_ids, type=emb_t.schema.field("vec_id").type),
    "embedding": pa.FixedSizeListArray.from_arrays(
        pa.array(all_v.ravel(), type=pa.float32()), dim).cast(emb_field.type)
        if pa.types.is_fixed_size_list(emb_field.type)
        else pa.array(list(all_v), type=emb_field.type),
    "label": pa.array(all_labels, type=emb_t.schema.field("label").type),
})
pq.write_table(merged, f"{out}/embeddings.parquet", version="2.6")
print("embeddings: scaled with per-replica rotation + seeded sign flips")

for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    n = con.sql(f"SELECT count(*) FROM '{out}/{t}.parquet'").fetchone()[0]
    print(f"  {t}: {n}")
print("done")
