#!/usr/bin/env python3
"""Growth-exponent check across bench tiers (r6 VERDICT #7): for each query
present in two tiers, the time ratio vs the data ratio. A query growing
faster than (scale)^1.2 between tiers has a super-linear plan — unless it is
the documented Θ(n²) exhaustive query.

Usage: python3 tools/growth.py BENCH_r07_sf1.json BENCH_r07_sf10.json 10
  (third arg = data ratio between the two artifacts)
"""
import json, sys

def main(lo_path, hi_path, ratio):
    lo = json.load(open(lo_path))["queries"]
    hi = json.load(open(hi_path))["queries"]
    ratio = float(ratio)
    allowed = ratio ** 1.2
    rows = []
    for name in sorted(hi):
        if name not in lo or lo[name] <= 0 or hi[name] <= 0:
            continue
        g = hi[name] / lo[name]
        rows.append((g, name, lo[name], hi[name]))
    rows.sort(reverse=True)
    print(f"{'growth':>8}  {'lo_s':>8}  {'hi_s':>8}  query   (allowed {allowed:.1f}x for {ratio:.0f}x data)")
    flagged = 0
    for g, name, l, h in rows:
        mark = " <-- SUPER-LINEAR" if g > allowed else ""
        if g > allowed:
            flagged += 1
        if g > allowed or len(rows) - rows.index((g, name, l, h)) > len(rows) - 15:
            pass
        print(f"{g:8.2f}  {l:8.3f}  {h:8.3f}  {name}{mark}")
    print(f"\n{len(rows)} comparable queries; {flagged} above (scale)^1.2")
    return 1 if flagged else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], sys.argv[3]))
