"""Rank an optimized-HLO text dump's ops by output bytes, with metadata.

Usage: python tools/hlo_rank.py epoch_hlo.txt [kind-regex] [n]

Crude but effective attribution: for copy/transpose/pad ops, output bytes
~= HBM traffic/2; for fusions it is a lower bound.  Prints shape, op name,
and the op_name= metadata (source annotation) so hot trace ops can be
matched to model code.
"""
import re
import sys
from collections import defaultdict

DT_BYTES = {"f32": 4, "bf16": 2, "s32": 4, "u32": 4, "s8": 1, "u8": 1,
            "pred": 1, "f16": 2, "s64": 8, "u64": 8, "f64": 8, "s16": 2,
            "u16": 2}


def shape_bytes(s):
    tot = 0
    for m in re.finditer(r"(\w+)\[([\d,]*)\]", s):
        dt, dims = m.group(1), m.group(2)
        b = DT_BYTES.get(dt)
        if b is None:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        tot += n * b
    return tot


def main():
    path = sys.argv[1]
    kind = re.compile(sys.argv[2]) if len(sys.argv) > 2 else re.compile(
        r"copy|transpose|fusion|pad|reshape|slice|convolution|dot")
    n_top = int(sys.argv[3]) if len(sys.argv) > 3 else 30
    rows = []
    for line in open(path):
        m = re.match(r"\s*(?:ROOT )?%?([\w.\-]+) = (\([^)]*\)|\S+) (\w+)\(",
                     line)
        if not m:
            continue
        name, shape, op = m.groups()
        if not kind.search(op) and not kind.search(name):
            continue
        meta = re.search(r'op_name="([^"]*)"', line)
        src = re.search(r'source_file="([^"]*)".*source_line=(\d+)', line)
        rows.append((shape_bytes(shape), name, op, shape[:60],
                     (meta.group(1)[:90] if meta else ""),
                     (f"{src.group(1).split('/')[-1]}:{src.group(2)}"
                      if src else "")))
    rows.sort(key=lambda r: -r[0])
    agg = defaultdict(lambda: [0, 0])
    for b, name, op, shape, meta, src in rows:
        agg[op][0] += b
        agg[op][1] += 1
    print("by op kind (sum of output bytes):")
    for op, (b, c) in sorted(agg.items(), key=lambda kv: -kv[1][0])[:12]:
        print(f"  {op:22s} {b/2**30:8.2f} GiB x{c}")
    print(f"top {n_top} ops:")
    for b, name, op, shape, meta, src in rows[:n_top]:
        print(f"  {b/2**20:9.1f} MB {name:28s} {shape:48s} {src:28s} {meta}")


if __name__ == "__main__":
    main()
