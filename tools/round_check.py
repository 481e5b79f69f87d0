#!/usr/bin/env python3
"""Round-close self-check: compare the fresh bench/correctness artifacts
against the previous round's before claiming the round done. Round 10
closed on a silently red sweep (55 erroring + 6 silently-wrong queries
after a testdata regeneration); this gate makes that impossible to miss.

Usage:
  python3 tools/round_check.py <fresh_bench.json> [prev_bench.json]

Checks (exit 1 on any failure):
  1. fresh `failed` list is empty
  2. no query present in prev is missing from fresh
  3. no query regressed more than REGRESSION_X vs prev (floors-aware:
     queries under MIN_SEC are noise and skipped), reported but
     non-fatal unless > HARD_X
"""
import json
import sys

REGRESSION_X = 1.3   # warn threshold vs previous round
HARD_X = 3.0         # fail threshold vs previous round
MIN_SEC = 1.0        # ignore sub-second timing noise


def main():
    fresh = json.load(open(sys.argv[1]))
    prev = json.load(open(sys.argv[2])) if len(sys.argv) > 2 else None
    ok = True

    failed = fresh.get("failed", [])
    if failed:
        print(f"FAIL: fresh run has {len(failed)} failed queries: {failed[:10]}...")
        ok = False
    else:
        print(f"ok: failed=[] ({len(fresh.get('queries', {}))} queries timed)")

    if prev:
        fq, pq = fresh.get("queries", {}), prev.get("queries", {})
        missing = sorted(set(pq) - set(fq))
        if missing:
            print(f"FAIL: queries present in prev but missing from fresh: {missing}")
            ok = False
        hard, soft = [], []
        for q, p in pq.items():
            f = fq.get(q)
            if f is None or p < MIN_SEC or f < 0 or p < 0:
                continue
            if f > p * HARD_X:
                hard.append((q, p, f))
            elif f > p * REGRESSION_X:
                soft.append((q, p, f))
        for q, p, f in sorted(soft, key=lambda t: t[2] / t[1], reverse=True):
            print(f"warn: {q} {p:.2f}s -> {f:.2f}s ({f/p:.1f}x)")
        for q, p, f in sorted(hard, key=lambda t: t[2] / t[1], reverse=True):
            print(f"FAIL: {q} {p:.2f}s -> {f:.2f}s ({f/p:.1f}x > {HARD_X}x)")
        if hard:
            ok = False
        tot_f, tot_p = fresh.get("value"), prev.get("value")
        if tot_f and tot_p:
            print(f"total: prev {tot_p:.1f}s -> fresh {tot_f:.1f}s ({tot_f/tot_p:.2f}x)")

    print("ROUND CHECK " + ("PASS" if ok else "FAIL"))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
