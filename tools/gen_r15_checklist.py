#!/usr/bin/env python3
"""Render the r15 optimization checklist table from two BENCH_DETAIL
records (baseline run J vs the round-final run), tagging each query
with what this round did to its path. Output: markdown to stdout."""
import json, sys

base = json.load(open(sys.argv[1]))
fin = json.load(open(sys.argv[2]))

# what touched each query's path this round (hand-maintained, from the
# change log in OPTIMIZATION_r15.md)
TAGS = {
    "q27": "erf memo",
    "p04": "md5-slice (token hash)", "p19": "md5-slice (sample bucket)",
    "p34": "md5-slice (sample bucket)", "p77": "md5-slice (quota order)",
    "p44": "md5-slice (DSIR buckets)",
    "p47": "md5-slice (NB buckets)", "p82": "md5-slice (NB buckets)",
    "p101": "md5-slice (NB buckets)", "p58": "md5-slice (NB+PPL buckets)",
    "p55": "md5-slice (PPL buckets x2/token)", "p83": "md5-slice (PPL buckets)",
    "p89": "md5-slice (HLL slices)", "p90": "md5-slice (HLL slices)",
    "p91": "md5-slice (CMS slot)", "p93": "md5-slice (CMS slot)",
    "p72": "md5-slice (bloom bits)", "p84": "md5-slice (bloom bits)",
    "p71": "md5-slice (bloom bits)", "p73": "md5-slice (CDC boundary)",
    "p50": "md5-slice (line hash)", "p97": "md5-slice (gram hash)",
    "p49": "md5-slice (band/bloom probes)",
    "p65": "map-only fertility (scalar encodes)",
    "p52": "scalar bpe_encode face", "p61": "scalar unigram_encode face",
    "p98": "driver-map MM loop",
    "p96": "closed-form power steps; CC -1 exchange/round",
    "p99": "materialized bounded candidate list",
    "p20": "CC -1 exchange/round (artifact build)",
    "p36": "CC (shared artifact)", "p45": "md5-slice + CC artifact",
    "p100": "CC (shared artifact)", "p62": "CC -1 exchange/round",
    "p40": "CC -1 exchange/round",
    "p02": "A/B'd checkpoint, kept lazy (scale-correct)",
    "p86": "bm25 shared projection", "p87": "bm25 shared projection",
    "p95": "bm25 shared projection (sparse side)",
}
LEFT = {
    "p11": "real codec decode — the cost IS the work",
    "p78": "real codec decode", "p79": "real codec decode",
    "p05": "tuned primitive kernel; Omega(n^2) declared",
    "q01": "bench sentinel — plan stability is load-bearing",
    "q05": "bench sentinel", "q02": "flagship, 0.29x baseline",
    "p32": "exchange already reused; md5 prefix re-key = semantics change",
    "p16": "asof: single-shuffle union+window already",
    "p17": "range join: banded already",
}

qb, qf = base["queries_full"], fin["queries_full"]
rows = []
for name in sorted(qf):
    short = name.split("_")[0]
    tag = TAGS.get(short) or LEFT.get(short) or \
        "examined at family level; no repeated subtrees, no change"
    b = qb.get(name, float("nan"))
    f = qf[name]
    rows.append((name, b, f, tag))

print("| query | run J (s) | final (s) | this round |")
print("|---|---|---|---|")
for name, b, f, tag in rows:
    print(f"| {name} | {b:.2f} | {f:.2f} | {tag} |")
tb = sum(v for v in qb.values() if v > 0)
tf = sum(v for v in qf.values() if v > 0)
print(f"\nTotals: run J {tb:.1f} s -> final {tf:.1f} s over {len(qf)} queries.")
