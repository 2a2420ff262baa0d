"""Exclusive (self) time per op over an xplane trace: nested events'
durations are subtracted from their parents on each timeline line, so
categories sum to the device-busy total instead of double counting.

Usage: python scripts/xplane_selftime.py <trace_dir> [top_n]
"""

import collections
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from xplane_summary import load, device_planes  # noqa: E402


def self_times(plane):
    totals = collections.Counter()
    counts = collections.Counter()
    for line in plane.lines:
        lname = (line.display_name or line.name).lower()
        if "step" in lname or "framework" in lname:
            continue
        evs = []
        for ev in line.events:
            md = plane.event_metadata[ev.metadata_id]
            name = md.display_name or md.name
            evs.append((ev.offset_ps, ev.offset_ps + ev.duration_ps, name))
        evs.sort()
        # stack-based exclusive time (events on one line nest or disjoint)
        stack = []  # (start, end, name, child_time)
        def pop_done(upto):
            while stack and stack[-1][1] <= upto:
                s, e, n, ct = stack.pop()
                self_ps = (e - s) - ct
                totals[n] += self_ps
                counts[n] += 1
                if stack:
                    stack[-1][3] += e - s
        for s, e, n in evs:
            pop_done(s + 1)
            stack.append([s, e, n, 0])
        pop_done(float("inf"))
    return totals, counts


def main():
    xs, path = load(sys.argv[1])
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    print(f"# {path}")
    for p in device_planes(xs):
        totals, counts = self_times(p)
        busy = sum(totals.values())
        print(f"\n== plane '{p.name}': self-time total "
              f"{busy / 1e9:.2f} ms ==")
        for name, ps in totals.most_common(top_n):
            print(f"  {ps / 1e9:9.3f} ms  x{counts[name]:<4d} {name}")


if __name__ == "__main__":
    main()
