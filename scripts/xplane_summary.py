"""Summarise a jax.profiler xplane trace: per-op total device time.

The tensorboard profiler plugin in this image cannot parse xspaces
(pywrap mismatch), so this decodes the .xplane.pb directly with a
minimal mirror of the public xplane schema (scripts/xplane_proto/).

Usage:
  python scripts/xplane_summary.py <trace_dir_or_xplane.pb> [top_n]

Prints one line per XLA op/fusion on the device plane(s), sorted by
total self time, plus the plane totals — the TPU equivalent of the
reference's chrome-trace profile dump (/root/reference/train.py:355-383).
"""

import collections
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from xplane_proto import xplane_pb2  # noqa: E402


def load(path):
    if os.path.isdir(path):
        cands = glob.glob(os.path.join(path, "**/*.xplane.pb"),
                          recursive=True)
        assert cands, f"no .xplane.pb under {path}"
        path = max(cands, key=os.path.getmtime)
    xs = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xs.ParseFromString(f.read())
    return xs, path


def device_planes(xs):
    for p in xs.planes:
        n = p.name.lower()
        if "tpu" in n or "/device" in n or "gpu" in n:
            yield p


def summarize(plane):
    """{op_name: (total_ps, count)} over XLA-op lines of one plane."""
    totals = collections.Counter()
    counts = collections.Counter()
    span = 0
    for line in plane.lines:
        # device planes carry one line per core with XLA ops; steps and
        # derived lines (e.g. 'Steps', 'Framework') are skipped
        lname = (line.display_name or line.name).lower()
        if "step" in lname or "framework" in lname:
            continue
        for ev in line.events:
            md = plane.event_metadata[ev.metadata_id]
            name = md.display_name or md.name
            totals[name] += ev.duration_ps
            counts[name] += 1
            span = max(span, ev.offset_ps + ev.duration_ps)
    return totals, counts, span


def line_breakdown(plane, top_n):
    """Per execution-unit (XLine) busy time with flattened self time.

    Events on one line can nest (cond wrapping its branch); flattened
    busy time = union of event intervals, so a line's number is its true
    occupancy.  Also prints each line's top ops by SELF time (event
    duration minus covered child time on the same line).
    """
    for line in plane.lines:
        evs = sorted(((e.offset_ps, e.duration_ps, e.metadata_id)
                      for e in line.events))
        if not evs:
            continue
        # union of intervals = occupancy; self time via interval nesting
        busy = 0
        cur_s = cur_e = None
        self_ps = collections.Counter()
        counts = collections.Counter()
        stack = []  # (end_ps, metadata_id, child_cover)
        for off, dur, mid in evs:
            end = off + dur
            if cur_s is None:
                cur_s, cur_e = off, end
            elif off > cur_e:
                busy += cur_e - cur_s
                cur_s, cur_e = off, end
            else:
                cur_e = max(cur_e, end)
            while stack and stack[-1][0] <= off:
                e2, m2, cov = stack.pop()
                self_ps[m2] += 0  # finalized below via subtraction
            # attribute: parent loses child's duration
            if stack and end <= stack[-1][0]:
                self_ps[stack[-1][1]] -= dur
            stack.append((end, mid, 0))
            self_ps[mid] += dur
            counts[mid] += 1
        if cur_s is not None:
            busy += cur_e - cur_s
        name = line.display_name or line.name
        print(f"\n-- line '{name}': {len(line.events)} events, "
              f"busy(flat) {busy / 1e9:.2f} ms --")
        md = plane.event_metadata
        for mid, ps in self_ps.most_common(top_n):
            nm = md[mid].display_name or md[mid].name
            print(f"{ps / 1e9:9.3f} ms  x{counts[mid]:<4d} {nm[:100]}")


def main():
    path = sys.argv[1]
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    by_line = "--lines" in sys.argv
    xs, used = load(path)
    print(f"# {used}")
    for plane in device_planes(xs):
        if by_line:
            print(f"\n== plane '{plane.name}' ==")
            line_breakdown(plane, top_n)
            continue
        totals, counts, span = summarize(plane)
        total_ms = sum(totals.values()) / 1e9
        print(f"\n== plane '{plane.name}': {len(totals)} distinct ops, "
              f"busy {total_ms:.2f} ms ==")
        for name, ps in totals.most_common(top_n):
            print(f"{ps / 1e9:9.3f} ms  x{counts[name]:<4d} {name[:110]}")


if __name__ == "__main__":
    main()
