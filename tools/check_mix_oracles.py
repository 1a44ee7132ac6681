#!/usr/bin/env python3
"""Regenerate the HUGEINT mod-2^64 splitmix64/FNV mix chains used by the
minhash/ann_lsh/simhash DuckDB oracles and check the embedded SQL still
contains them verbatim. The chains are machine-generated (single-digit
typos yield silently-wrong oracles) — run this after any edit near them.

Usage: python3 tools/check_mix_oracles.py /tmp/verify_out/oracle_sql.json
"""
import json, sys

M = "18446744073709551616::HUGEINT"
C1, C2 = 0xBF58476D1CE4E5B9, 0x94D049BB133111EB

def mulm(a, c):
    bh, bl = c >> 32, c & 0xFFFFFFFF
    return (f"(({a} * {bl}::HUGEINT) % {M} + (({a} * {bh}::HUGEINT)"
            f" % 4294967296::HUGEINT) * 4294967296::HUGEINT) % {M}")

REQUIRED = {
    "minhash_lsh_pairs": [
        mulm("a1", C1), mulm("a2", C2),
        "xor(z0, z0 // 1073741824)", "xor(z1, z1 // 134217728)",
        "xor(z2, z2 // 2147483648)",
        "(xor(h, b) * 1099511628211::HUGEINT)",     # FNV-1a fold
        "11400714819323198485::HUGEINT",            # golden gamma
    ],
    "ann_lsh": [
        mulm("a1", C1), mulm("a2", C2),
        "CAST(xor(z2, z2 // 2147483648) // 2048 AS DOUBLE)",
        "4503599627370496.0",                       # 2^52
    ],
    "simhash_pairs": [
        "(xor(h, b) * 1099511628211::HUGEINT)",
        "14695981039346656037::HUGEINT",            # FNV offset basis
        "9223372036854775808::HUGEINT",             # signed-view pivot
        "bit_count(xor(a.f, b.f))",
    ],
    # Machine-emitted by graft.SketchOracles.mixChain — these guard the
    # EMITTER (a regression there rewrites every CMS/HLL oracle at once).
    "token_topk_cms": [
        mulm("a1x", C1), mulm("a2", C2),
        "xor(z1, z1 // 134217728)", "xor(z2, z2 // 2147483648)",
        "(xor(h, b) * 1099511628211::HUGEINT)",     # FNV-1a fold
        "11400714819323198485::HUGEINT",            # golden gamma pre-add
    ],
    "doc_chunk_assignments": [
        mulm("a1x", C1), mulm("a2", C2),
        "xor(z1, z1 // 134217728)", "xor(z2, z2 // 2147483648)",
        "11400714819323198485::HUGEINT",            # golden gamma pre-add
    ],
    "hourly_agg_approx": [
        mulm("a1x", C1), mulm("a2", C2),
        "11400714819323198485::HUGEINT",
        "4503599627370496::BIGINT",                 # 2^52 fixed-point scale
        "least(52, 57 - bit_count(v))",             # rho cap
    ],
    "stratified_sample": [
        mulm("a1x", C1), mulm("a2", C2),
        "(xor(h, b) * 1099511628211::HUGEINT)",     # FNV-1a fold
        "11400714819323198485::HUGEINT",            # golden gamma pre-add
        "mx // 2048",                               # 53-bit priority
    ],
    "token_budget_sample": [
        mulm("a1x", C1), mulm("a2", C2),
        "(xor(h, b) * 1099511628211::HUGEINT)",
        "11400714819323198485::HUGEINT",
        "mx // 2048",
        "cum_tokens - tokens <",                    # admission cut
    ],
    "gen_events_audit": [
        mulm("a1x", C1), mulm("a2", C2),
        "11400714819323198485::HUGEINT",            # golden gamma pre-add
        "mx // 2048",                               # 53-bit stream
        "9007199254740992.0",                       # 2^53 dyadic uniform
    ],
    "curation_funnel": [
        mulm("a1x", C1), mulm("a2", C2),
        "(xor(h, b) * 1099511628211::HUGEINT)",
        "11400714819323198485::HUGEINT",
        "9007199254740992.0",                       # 2^53 dyadic uniform
        "coalesce(shared_fraction, 0.0) <=",        # span gate
    ],
    "span_mask_plan": [
        mulm("a1x", C1), mulm("a2", C2),
        "11400714819323198485::HUGEINT",            # golden gamma pre-add
        "doc_id * 1000003 + pos",                   # per-position seed
        "mx % 16 = 0",                              # 1/16 mask gate
    ],
    "watermark_lateness": [
        mulm("a1x", C1), mulm("a2", C2),
        "11400714819323198485::HUGEINT",            # golden gamma pre-add
        "CAST(mx % 1024 AS BIGINT) * 1000000",      # 0..1023 s ingest delay
    ],
    "mixture_optimal_alloc": [
        mulm("a1x", C1), mulm("a2", C2),
        "(xor(h, b) * 1099511628211::HUGEINT)",     # FNV-1a fold (source)
        "11400714819323198485::HUGEINT",            # golden gamma pre-add
        "(mx % 8) + 1::HUGEINT",                    # weight 1..8
        "supply * (840::HUGEINT // w)",             # exact ratio sort key
        "supply * rem_w_from <= (budget - cum_s_before) * w",  # cap test
    ],
    "mixture_train_manifest": [
        mulm("a1x", C1), mulm("a2", C2),
        "(xor(h, b) * 1099511628211::HUGEINT)",     # FNV-1a folds
        "supply * rem_w_from <= (budget - cum_s_before) * w",  # solve
        "ac.cum_tokens - ac.tokens < CAST(fin.alloc AS BIGINT)",  # admit
        "FROM madm",                                # manifest reads admitted
        "row_number() OVER (PARTITION BY doc_id ORDER BY w DESC, s)",  # HRW
    ],
    "curated_mixture_alloc": [
        mulm("a1x", C1), mulm("a2", C2),
        "(xor(h, b) * 1099511628211::HUGEINT)",     # FNV-1a fold (source)
        "r <= (500000 * n + 999999) // 1000000",    # per-source keep rule
        "supply * rem_w_from <= (budget - cum_s_before) * w",  # cap test
        "FROM gkept",                               # solve reads survivors
    ],
    "mixture_hierarchical": [
        mulm("a1x", C1), mulm("a2", C2),
        "(xor(h, b) * 1099511628211::HUGEINT)",     # FNV-1a folds
        "'dom' || CAST((mx // 8) % 4 AS VARCHAR)",  # domain bits 3-4
        "OVER (PARTITION BY domain ORDER BY skey, source",  # level-2 windows
        "supply * rem_w_from <= (budget - cum_s_before) * w",  # cap test
    ],
    "mixture_admission_audit": [
        mulm("a1x", C1), mulm("a2", C2),
        "(xor(h, b) * 1099511628211::HUGEINT)",     # FNV-1a folds
        "supply * rem_w_from <= (budget - cum_s_before) * w",  # solve
        "CAST(mx // 2048 AS BIGINT) AS pri",        # admission priority
        "ac.cum_tokens - ac.tokens < CAST(fin.alloc AS BIGINT)",  # admit
    ],
    "mixture_epoch_alloc": [
        mulm("a1x", C1), mulm("a2", C2),
        "(xor(h, b) * 1099511628211::HUGEINT)",     # FNV-1a fold (source)
        "* 4 AS supply",                            # repeatable supply (E=4)
        "// 4000000 AS budget",                     # budget in raw passes
        "supply * rem_w_from <= (budget - cum_s_before) * w",  # cap test
        "(alloc * 4000000) // supply",              # epochs_ppm
    ],
}

import re
def norm(s):
    s = re.sub(r"\s+", " ", s)
    return s.replace("( ", "(").replace(" )", ")")

oracle = json.load(open(sys.argv[1]))
fail = 0
for name, fragments in REQUIRED.items():
    sql = norm(oracle.get(name, ""))
    fragments = [norm(f) for f in fragments]
    for frag in fragments:
        if frag not in sql:
            print(f"FAIL {name}: missing fragment: {frag}")
            fail += 1
    if all(f in sql for f in fragments):
        print(f"OK   {name}: all {len(fragments)} generated fragments present")
print("RESULT:", "ALL OK" if fail == 0 else f"{fail} FAILURES")
sys.exit(1 if fail else 0)
