"""Bucket a JAX profiler trace's TPU ops by kind and print the top ops.

Usage: python tools/trace_buckets.py /tmp/member_trace [n_top]

Parses the trace.json.gz the profiler writes, keeps only device-lane
complete events, and groups durations by HLO-op-name prefix.  This is the
attribution tool behind the PERF.md epoch budgets (r3d/r3f).
"""
import gzip
import json
import re
import sys
from collections import defaultdict
from pathlib import Path


def main():
    root = Path(sys.argv[1])
    n_top = int(sys.argv[2]) if len(sys.argv) > 2 else 25
    paths = sorted(root.rglob("*.trace.json.gz"))
    if not paths:
        sys.exit(f"no trace.json.gz under {root}")
    data = json.loads(gzip.open(paths[-1], "rt").read())
    events = data.get("traceEvents", [])

    # device PIDs: process names containing "TPU" / "/device:"
    pid_name = {}
    tid_name = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_name[e["pid"]] = e["args"].get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_name[(e["pid"], e["tid"])] = e["args"].get("name", "")
    dev_pids = {p for p, n in pid_name.items()
                if "TPU" in n or "/device" in n.lower()}

    buckets = defaultdict(float)
    ops = defaultdict(lambda: [0.0, 0])
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        tname = tid_name.get((e["pid"], e["tid"]), "")
        # keep the op lanes, skip step/annotation lanes
        if "XLA Op" not in tname and "Ops" not in tname and tname != "":
            if not re.search(r"(?i)stream|core", tname):
                continue
        dur = e.get("dur", 0) / 1e6  # us -> s
        name = e.get("name", "?")
        total += dur
        ops[name][0] += dur
        ops[name][1] += 1
        key = re.match(r"[a-zA-Z_\-]+", name)
        k = key.group(0).rstrip("._-") if key else name
        buckets[k] += dur

    print(f"trace {paths[-1]}")
    print(f"total device op time: {total:.3f} s")
    for k, v in sorted(buckets.items(), key=lambda kv: -kv[1])[:15]:
        print(f"  {k:30s} {v:8.3f} s")
    print("top ops:")
    for name, (dur, cnt) in sorted(ops.items(), key=lambda kv: -kv[1][0])[:n_top]:
        print(f"  {dur:8.3f} s x{cnt:5d}  {name[:110]}")


if __name__ == "__main__":
    main()
