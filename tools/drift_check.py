"""Compare two bench.py JSON outputs and flag per-query drift.

    python tools/drift_check.py OLD.json NEW.json [ratio]

Prints one line per query whose NEW/OLD wall ratio exceeds the
threshold (default 1.3 — BASELINE.md's ledger rule: flag only >1.3x
moves, then diff the plans), plus the totals. Exit code 1 if anything
flagged, so a round driver can gate on it.
"""

from __future__ import annotations

import json
import sys


def main() -> int:
    old_path, new_path = sys.argv[1], sys.argv[2]
    threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 1.3

    def load(path):
        d = json.load(open(path))
        # driver BENCH_r{N}.json wraps the bench line under "parsed"
        return d.get("parsed", d) if "queries" not in d else d

    old = load(old_path)
    new = load(new_path)
    flagged = 0
    for tier in ("queries", "tpch", "pipeline", "yelp_e2e", "ann_serving"):
        o, n = old.get(tier, {}), new.get(tier, {})
        for name in sorted(set(o) & set(n)):
            if o[name] > 0 and n[name] / o[name] > threshold:
                print(f"FLAG {tier}/{name}: {o[name]:.2f}s -> {n[name]:.2f}s "
                      f"({n[name] / o[name]:.2f}x)")
                flagged += 1
        gone, added = sorted(set(o) - set(n)), sorted(set(n) - set(o))
        if gone:
            print(f"NOTE {tier}: dropped {gone}")
        if added:
            print(f"NOTE {tier}: added {added}")
    print(f"totals: headline {old.get('value')} -> {new.get('value')}"
          f" | tpch {old.get('tpch_total')} -> {new.get('tpch_total')}"
          f" | flagged {flagged} (threshold {threshold}x)")
    return 1 if flagged else 0


if __name__ == "__main__":
    sys.exit(main())
