"""Compute the NEXT round's driver-cap window from the CORRECTNESS files —
the rotation policy (every mirror's driver hash row ≤1 round old)
mechanized, so each round's reorder of QUERIES is a lookup, not a judgment
call.

Policy, in priority order for the ~50 in-cap slots:
  1. mirrors with NO driver row in any round (new this round);
  2. mirrors whose last row is OLDEST (rotate the stalest back in);
  3. within a staleness tier, keep registry order.
Mirrors that would be displaced must be green in the LATEST round's file,
else they are flagged (the invariant would break).

Usage: python tools/rotation_plan.py [cap]
Prints the recommended in-cap list + displaced list + any violations.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    cap = int(sys.argv[1]) if len(sys.argv) > 1 else 50

    from knowledgegraph__bh_ray import queries as Q

    order = list(Q.QUERIES.keys())
    mirrors = [k for k in order if k in Q.build_oracle_sql()]

    last_green: dict[str, int] = {}
    latest_round = 0
    for path in sorted(glob.glob("CORRECTNESS_r*.json")):
        rnd = int(re.search(r"r(\d+)", path).group(1))
        latest_round = max(latest_round, rnd)
        rows = json.load(open(path))
        for name, r in rows.items():
            if r.get("hash_match"):
                last_green[name] = max(last_green.get(name, 0), rnd)

    ranked = sorted(
        mirrors,
        key=lambda k: (last_green.get(k, -1), order.index(k)),
    )
    in_cap = ranked[:cap]
    displaced = [k for k in mirrors if k not in in_cap]

    print(f"# rotation plan for round {latest_round + 1} (cap={cap})")
    print(f"# mirrors: {len(mirrors)}; never-checked: "
          f"{[k for k in mirrors if k not in last_green]}")
    print("\n# IN-CAP (stalest first):")
    for k in in_cap:
        print(f"  {k}  (last green: r{last_green.get(k, 0) or '—'})")
    bad = [k for k in displaced if last_green.get(k, 0) < latest_round]
    print(f"\n# DISPLACED ({len(displaced)}):")
    for k in displaced:
        print(f"  {k}  (last green: r{last_green.get(k, 0)})")
    if bad:
        print(f"\n!! INVARIANT RISK — displaced but not green in "
              f"r{latest_round}: {bad}")
        return 1
    print("\ninvariant OK: every displaced mirror is green in the latest round")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
