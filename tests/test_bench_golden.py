"""The bench's small-scale adaptation trajectory matches the frozen golden.

VERDICT r3 item 8: math-regression detection must not depend on member
self-consistency alone.  bench.py BENCH_SMALL compares its per-epoch loss
trajectory and adapted-parameter digest against tests/golden/bench_small.json
(per backend); this test replays it on the CPU backend in a subprocess (the
bench owns its own jax configuration)."""

import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).parents[1]


def test_bench_small_matches_golden():
    golden = json.load(open(REPO / "tests" / "golden" / "bench_small.json"))
    assert "cpu" in golden, "record with BENCH_GOLDEN=record first"
    env = dict(
        os.environ,
        BENCH_SMALL="1", BENCH_INFER="0", BENCH_BACKEND="cpu",
        BENCH_COMPILE_CACHE="0",
    )
    env.pop("BENCH_GOLDEN", None)
    res = subprocess.run([sys.executable, str(REPO / "bench.py")],
                         capture_output=True, text=True, timeout=1200,
                         env=env, cwd=REPO)
    assert res.returncode == 0, res.stderr[-2000:]
    line = [l for l in res.stdout.splitlines() if l.startswith("{")][-1]
    out = json.loads(line)
    assert out["extra"].get("golden") == "ok", out["extra"]
