"""Histogram a jax.profiler trace by op: total device time per event name.

Usage: python tools/trace_report.py /tmp/prof [N]
Parses <dir>/plugins/profile/*/*.trace.json.gz and prints the top-N event
names by summed duration, with the HLO long_name (op + shapes) of the
largest instance. This is the reliable way to attribute cost on the
tunneled TPU backend (CLAUDE.md) — component microbenchmarks mis-attribute.
"""

import glob
import gzip
import json
import sys
from collections import defaultdict


def main():
    root = sys.argv[1]
    topn = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    files = glob.glob(f"{root}/plugins/profile/*/*.trace.json.gz")
    if not files:
        print(f"no trace under {root}")
        return
    tot = defaultdict(float)
    cnt = defaultdict(int)
    long = {}
    grand = 0.0
    for path in files:
        with gzip.open(path, "rt") as f:
            data = json.load(f)
        # keep only device-lane events (TensorCore pids); host lanes have
        # python/runtime names — filter by the presence of HLO metadata or
        # device-ish thread names
        for ev in data.get("traceEvents", []):
            if ev.get("ph") != "X":
                continue
            name = ev.get("name", "")
            dur = float(ev.get("dur", 0.0))
            args = ev.get("args") or {}
            if "long_name" not in args and "hlo_op" not in args and not name.startswith("fusion"):
                # keep anyway but tagged as host if no hlo info and clearly host-side
                if any(k in name for k in ("Thread", "python", "Await", "Execute", "Transfer")):
                    continue
            tot[name] += dur
            cnt[name] += 1
            if dur > long.get(name, (0, ""))[0] if isinstance(long.get(name), tuple) else True:
                long[name] = (dur, args.get("long_name", ""))
            grand += dur
    rows = sorted(tot.items(), key=lambda kv: -kv[1])[:topn]
    print(f"{'total_ms':>10s} {'count':>7s}  name")
    for name, us in rows:
        ln = long.get(name, (0, ""))[1]
        ln = (ln[:110] + "…") if len(ln) > 110 else ln
        print(f"{us / 1e3:10.2f} {cnt[name]:7d}  {name[:60]}")
        if ln:
            print(f"{'':19s}{ln}")


if __name__ == "__main__":
    main()
