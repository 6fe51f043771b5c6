#!/usr/bin/env python3
"""Assemble CORRECTNESS_100x_r{N}.json from per-pack check.py records.

Usage: python3 tools/record_100x.py <round> <out.json> \
          <pack>=<check_json> [<pack>=<check_json> ...]

The first pack is the DEFAULT (its entries keep their bare names);
entries from later packs are suffixed `@<pack>` — the r13 record
format the judge reads (entries/packs/round/summary).
"""
import sys, json

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
