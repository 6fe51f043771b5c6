#!/usr/bin/env python3
"""Assemble CORRECTNESS_100x_r{N}.json from per-pack check.py records.

Usage: python3 tools/record_100x.py <round> <out.json> \
          <pack>=<check_json> [<pack>=<check_json> ...]

The first pack is the DEFAULT (its entries keep their bare names);
entries from later packs are suffixed `@<pack>` — the r13 record
format the judge reads (entries/packs/round/summary).
"""
import sys, json, os

# The canonical 100x exclusion list (docs/SCALE.md "closed-form 100x
# absentee table") - every oracle entry NOT expected in the record,
# mapped to the evidence that binds instead. Audited below: an
# absentee that appears in the record, or a record gap not named
# here, prints a LOUD warning so exclusions stay closed-form instead
# of being re-derived by diff each round (VERDICT r13 #5 / r14 #6).
PERMANENT_ABSENTEES = {
    "dedup_ngram_jaccard": "dedup_ngram_planted_check@plantedtext100",
    "dedup_containment": "dedup_containment_planted_check@plantedtext100",
    "dedup_clusters": "dedup_clusters_planted_check@plantedtext100",
    "dedup_survivors": "dedup_survivors_planted_check@plantedtext100",
    "dedup_minhash_lsh_check": "dedup_minhash_planted_check@plantedtext100",
    "dedup_simhash_check": "dedup_simhash_planted_check@plantedtext100",
    "dedup_incremental_check":
        "dedup_incremental_planted_check@plantedtext100",
    "dedup_embedding": "dedup_embedding_lsh_planted_check@planted100",
    "dedup_embedding_lsh_check":
        "dedup_embedding_lsh_planted_check@planted100",
    "sim_lsh_ann_check": "sim_lsh_ann_planted_check@planted100",
    "sim_ivf_ann_check": "sim_ivf_ann_planted_check@planted100",
    "sim_ivfpq_check": "sim_ivfpq_planted_check@planted100",
    "sim_filtered_ann_check": "sim_filtered_ann_planted_check@planted100",
    "sim_bruteforce_topk": "10x-only (IS the exact baseline)",
    "dedup_edit_pairs": "10x-only (flat-pack verbatim replicas make the "
        "pair OUTPUT quadratic in replicas — C(100,2) per dup group; "
        "10x oracle green + blocked==brute-force spec bind)",
    "sim_quantized_check": "10x-only (needs the exact baseline side)",
}

rnd, out = int(sys.argv[1]), sys.argv[2]
entries = {}
for i, spec in enumerate(sys.argv[3:]):
    pack, path = spec.split("=", 1)
    rec = json.load(open(path))
    for name, v in rec.items():
        key = name if i == 0 else f"{name}@{pack}"
        entries[key] = v

green = sum(1 for v in entries.values()
            if v.get("hash_match") and v.get("rows_match")
            and v.get("schema_match"))
oracle = sum(1 for v in entries.values() if v.get("err") != "no_oracle")
red = [k for k, v in entries.items()
       if v.get("err") != "no_oracle"
       and not (v.get("hash_match") and v.get("rows_match")
                and v.get("schema_match"))]
doc = {
    "round": rnd,
    "packs": {
        "flat100": "scale_up.py sf0.1 x100 (60M lineitem, 15M orders, "
                   "10M events, 500k docs, 200k vecs)",
        "planted100": "scale_up.py sf0.1 x100 --plant-dups (jittered "
                      "embedding near-copies at vec_id+5e8 - the "
                      "embedding-dedup/ANN recall regime)",
        "plantedtext100": "scale_up.py sf0.1 x100 --plant-text-dups "
                          "(three near-dup plant tiers at doc_id+5e8 - "
                          "the pair-dedup linear-oracle regime)",
        "zipf100": "scale_up.py sf0.1 x100 --zipf-users (10.5k distinct "
                   "users, heavy hitters - the topk/uniq exact regime)",
    },
    "summary": {
        "oracle_checked": oracle,
        "hash_green": green,
        "red": len(red),
        "red_detail": "; ".join(red) if red else "",
    },
    "entries": entries,
}
json.dump(doc, open(out, "w"), indent=1, sort_keys=True)
print(f"{out}: {oracle} oracle-checked, {green} green, red: {red}")

# absentee audit against the canonical table (docs/SCALE.md)
present_absentees = sorted(set(PERMANENT_ABSENTEES) & set(entries))
if present_absentees:
    print(f"WARNING: listed absentees present in the record "
          f"(promote them out of the table): {present_absentees}")
oracle_json = os.environ.get("GRAFT_ORACLE_JSON")
if oracle_json and os.path.exists(oracle_json):
    full = set(json.load(open(oracle_json)))
    bare = {k.split("@")[0] for k in entries}
    unexplained = sorted(full - bare - set(PERMANENT_ABSENTEES))
    # streaming entries are the documented engine-startup class; six
    # headliners run, the rest are covered by batch twins
    unexplained = [u for u in unexplained if not u.startswith("stream_")]
    if unexplained:
        print(f"WARNING: oracle entries missing from the record and "
              f"NOT in the absentee table: {unexplained}")
    else:
        print("absentee audit: clean (every gap named in the table)")
