#!/usr/bin/env python3
"""Cross-round bench comparison on MEDIAN-OF-RATIOS, not sums
(VERDICT r12 #2: the per-query noise band is +/-20-30%, so a sum
comparison amplifies a handful of noisy movers into a phantom
regression; the median of per-query new/old ratios cancels host drift
because every query pair shares it).

Usage: dev/bench_ratio.py OLD.json NEW.json [threshold=1.3]

Reads two BENCH_LOCAL-format files ({"queries": {name: sec}, optional
"spread": {name: max/min}}), prints the median / p10 / p90 of per-query
ratios over the shared query set, and lists movers whose ratio exceeds
the threshold IN EXCESS of their own measured spread (a query that
moved 1.4x but whose min-of-3 spread was 1.5x is noise, not a mover).
Exit code 1 if the median ratio itself exceeds the threshold.
"""
import json
import statistics
import sys


def main() -> int:
    old_path, new_path = sys.argv[1], sys.argv[2]
    threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 1.3
    old = json.load(open(old_path))
    new = json.load(open(new_path))
    oq, nq = old["queries"], new["queries"]
    shared = sorted(set(oq) & set(nq))
    if not shared:
        print("no shared queries")
        return 2
    ratios = {k: nq[k] / oq[k] for k in shared if oq[k] > 0}
    vals = sorted(ratios.values())
    med = statistics.median(vals)
    p10 = vals[max(0, int(len(vals) * 0.1) - 1)]
    p90 = vals[min(len(vals) - 1, int(len(vals) * 0.9))]
    print(f"shared={len(shared)} median_ratio={med:.3f} "
          f"p10={p10:.3f} p90={p90:.3f}")
    spread_old = old.get("spread", {})
    spread_new = new.get("spread", {})
    movers = []
    for k, r in sorted(ratios.items(), key=lambda kv: -kv[1]):
        # noise floor for this query: the worse of the two runs' own
        # measured spreads (defaults to the threshold when unknown)
        floor = max(spread_old.get(k, 1.0), spread_new.get(k, 1.0))
        if r > max(threshold, floor) or 1 / r > max(threshold, floor):
            movers.append((k, r, floor))
    if movers:
        print(f"movers beyond max(threshold={threshold}, own spread):")
        for k, r, floor in movers[:20]:
            print(f"  {k}: {oq[k]:.3f}s -> {nq[k]:.3f}s "
                  f"(ratio {r:.2f}, spread floor {floor:.2f})")
    else:
        print("no movers beyond threshold+spread")
    return 1 if med > threshold else 0


if __name__ == "__main__":
    sys.exit(main())
