"""Join a profiler trace with the matching optimized-HLO dump: per-op
device time attributed to source file:line (HLO metadata).

Usage: python tools/trace_attrib.py TRACE_DIR HLO_TXT [n_top]

Requires the trace and dump to come from the SAME compiled program (op
names like fusion.2954 must match).
"""
import gzip
import json
import re
import sys
from collections import defaultdict
from pathlib import Path


def load_trace(root):
    paths = sorted(Path(root).rglob("*.trace.json.gz"))
    data = json.loads(gzip.open(paths[-1], "rt").read())
    events = data.get("traceEvents", [])
    pid_name = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_name[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, n in pid_name.items()
                if "TPU" in n or "/device" in n.lower()}
    ops = defaultdict(lambda: [0.0, 0])
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        ops[e.get("name", "?")][0] += e.get("dur", 0) / 1e6
        ops[e.get("name", "?")][1] += 1
    return ops


def load_meta(hlo_path):
    meta = {}
    for line in open(hlo_path):
        m = re.match(r"\s*(?:ROOT )?%?([\w.\-]+) = ", line)
        if not m:
            continue
        src = re.search(r'source_file="([^"]*)".*?source_line=(\d+)', line)
        op = re.search(r'op_name="([^"]*)"', line)
        tag = ""
        if src:
            tag = f"{src.group(1).split('/')[-1]}:{src.group(2)}"
        elif op:
            tag = "op:" + op.group(1).split("/")[-1][:40]
        meta[m.group(1)] = tag
    return meta


def main():
    trace_dir, hlo_path = sys.argv[1], sys.argv[2]
    n_top = int(sys.argv[3]) if len(sys.argv) > 3 else 30
    ops = load_trace(trace_dir)
    meta = load_meta(hlo_path)
    # drop container ops (while/conditional double-count their bodies)
    skip = re.compile(r"^(while|conditional)\b")
    agg = defaultdict(lambda: [0.0, 0])
    unmatched = 0.0
    total = 0.0
    for name, (dur, cnt) in ops.items():
        if skip.match(name):
            continue
        total += dur
        tag = meta.get(name)
        if tag is None:
            unmatched += dur
            tag = "<not-in-hlo>"
        elif not tag:
            tag = "<no-metadata>"
        agg[tag][0] += dur
        agg[tag][1] += cnt
    print(f"total flat device time {total:.3f} s "
          f"(unmatched {unmatched:.3f} s)")
    for tag, (dur, cnt) in sorted(agg.items(), key=lambda kv: -kv[1][0])[:n_top]:
        print(f"  {dur:8.3f} s x{cnt:6d}  {tag}")


if __name__ == "__main__":
    main()
