#!/usr/bin/env python3
"""Diff the canonicalized static-plan fingerprints of two Bench JSONs.

Usage: python3 scripts/plandiff.py BENCH_a.json BENCH_b.json

Bench (since round 5) emits "plans": {query: md5-of-canonicalized-plan}.
A changed hash means the PLANNED shape changed between the two runs —
broadcast->SMJ flips, new shuffles, rewrite-rule changes — which is the
thing to investigate before reading timing deltas (host noise moves
numbers; it never moves plan hashes). AQE runtime re-plans are not
visible here (the hash is the static plan); stats-driven flips are.

Also reports per-query best-sample timing deltas >2x alongside, flagged
NOISE when the run's sentinel marked the host loaded.
"""
import json, sys

def load(p):
    with open(p) as f:
        txt = f.read()
    # Bench prints one JSON object line; tolerate surrounding log lines
    for line in txt.splitlines():
        line = line.strip()
        if line.startswith('{"metric"'):
            return json.loads(line)
    return json.loads(txt)

def main():
    a, b = load(sys.argv[1]), load(sys.argv[2])
    pa, pb = a.get("plans", {}), b.get("plans", {})
    qa, qb = a.get("queries", {}), b.get("queries", {})
    if not pa or not pb:
        missing = [p for p, d in ((sys.argv[1], pa), (sys.argv[2], pb)) if not d]
        sys.exit(f"no \"plans\" field in: {', '.join(missing)} (pre-round-5 bench?)")
    common = sorted(set(pa) & set(pb))
    flipped = [q for q in common if pa[q] != pb[q]]
    only_a = sorted(set(pa) - set(pb))
    only_b = sorted(set(pb) - set(pa))
    noisy = a.get("sentinel", {}).get("noisy") or b.get("sentinel", {}).get("noisy")

    print(f"{len(common)} common queries; {len(flipped)} plan flips")
    for q in flipped:
        print(f"  FLIP {q}: {pa[q]} -> {pb[q]}  ({qa.get(q, '?')}s -> {qb.get(q, '?')}s)")
    if only_a: print(f"only in {sys.argv[1]}: {', '.join(only_a)}")
    if only_b: print(f"only in {sys.argv[2]}: {', '.join(only_b)}")

    moved = [(q, qa[q], qb[q]) for q in common
             if isinstance(qa.get(q), (int, float)) and isinstance(qb.get(q), (int, float))
             and qa[q] > 0 and qb[q] > 0 and max(qa[q] / qb[q], qb[q] / qa[q]) > 2.0]
    if moved:
        tag = " [host NOISY — timing deltas unreliable]" if noisy else ""
        print(f"\n{len(moved)} timing moves >2x (same plan unless flagged above){tag}:")
        for q, x, y in sorted(moved, key=lambda t: -max(t[1] / t[2], t[2] / t[1])):
            print(f"  {q}: {x}s -> {y}s")
    sys.exit(1 if flipped else 0)

if __name__ == "__main__":
    main()
