"""Compare two bench JSON outputs: totals, per-suite groups, and every
per-query delta beyond a threshold — the round-over-round regression
triage the README 'Benchmark provenance' notes are built from.

Usage: python scripts/bench_compare.py OLD.json NEW.json [threshold_sec]
"""

from __future__ import annotations

import json
import sys
from collections import defaultdict


def load(path: str) -> dict:
    with open(path) as f:
        return json.load(f)


def main() -> int:
    old, new = load(sys.argv[1]), load(sys.argv[2])
    thresh = float(sys.argv[3]) if len(sys.argv) > 3 else 1.0
    oq, nq = old["queries"], new["queries"]

    print(f"total: {old['value']:.1f}s -> {new['value']:.1f}s "
          f"({new['value'] - old['value']:+.1f}s; {len(oq)} -> {len(nq)} entries)")

    groups: dict[str, list[float]] = defaultdict(lambda: [0.0, 0.0])
    for name in set(oq) | set(nq):
        fam = name.split("_", 1)[0]
        groups[fam][0] += oq.get(name, 0.0)
        groups[fam][1] += nq.get(name, 0.0)
    print("\nper-family (old -> new):")
    for fam in sorted(groups, key=lambda f: -groups[f][1]):
        a, b = groups[fam]
        print(f"  {fam:12s} {a:7.1f}s -> {b:7.1f}s  ({b - a:+.1f})")

    news = sorted(set(nq) - set(oq), key=lambda n: -nq[n])
    if news:
        print(f"\nnew entries ({sum(nq[n] for n in news):.1f}s fixed cost):")
        for n in news:
            print(f"  {n}: {nq[n]:.2f}s")
    gone = set(oq) - set(nq)
    if gone:
        print(f"\nremoved entries: {sorted(gone)}")

    regs = [(nq[n] - oq[n], n) for n in set(oq) & set(nq) if nq[n] - oq[n] > thresh]
    print(f"\nregressions > {thresh}s: {len(regs)}")
    for d, n in sorted(regs, reverse=True):
        print(f"  {n}: {oq[n]:.2f}s -> {nq[n]:.2f}s (+{d:.2f})")
    wins = [(oq[n] - nq[n], n) for n in set(oq) & set(nq) if oq[n] - nq[n] > thresh]
    if wins:
        print(f"\nimprovements > {thresh}s: {len(wins)}")
        for d, n in sorted(wins, reverse=True):
            print(f"  {n}: {oq[n]:.2f}s -> {nq[n]:.2f}s (-{d:.2f})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
