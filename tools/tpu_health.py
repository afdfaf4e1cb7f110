"""Bounded TPU worker health probe.

The remote v5e worker can WEDGE outright (CLAUDE.md: every jax op
including `jax.devices()` hangs for hours), and a wedged worker turns any
naive "let me just check the chip" into a stuck session.  This tool runs
the check in a SUBPROCESS with a hard timeout so the caller always gets
an answer:

    python tools/tpu_health.py [--timeout 240]

Exit codes / single-line verdicts:
    0  HEALTHY   devices() + tiny jit matmul completed within the bound
    2  WEDGED    the probe subprocess hit the timeout (worker or tunnel
                 unresponsive — do NOT start on-chip work; recovery is
                 remote and slow)
    3  ERROR     the probe subprocess died with a real error (traceback
                 shown) — e.g. no TPU platform present

Use before any on-chip sequence (bench.py already pre-flights its Pallas
kernel the same way; this generalizes the pattern to plain chip
reachability).
"""

import argparse
import subprocess
import sys
import time

_PROBE = r"""
import time, jax
t0 = time.time()
d = jax.devices()
print("devices:", [str(x) for x in d], f"({time.time()-t0:.1f}s)", flush=True)
import jax.numpy as jnp
t0 = time.time()
x = jax.jit(lambda a: (a @ a).sum())(jnp.ones((256, 256), jnp.float32))
x.block_until_ready()
print("matmul:", float(x), f"({time.time()-t0:.1f}s)", flush=True)
"""


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--timeout", type=float, default=240.0,
                    help="hard bound in seconds (default 240; first "
                         "contact through a cold tunnel can take ~2 min)")
    args = ap.parse_args(argv)

    t0 = time.time()
    try:
        proc = subprocess.run([sys.executable, "-c", _PROBE],
                              capture_output=True, text=True,
                              timeout=args.timeout)
    except subprocess.TimeoutExpired as e:
        out = (e.stdout or b"")
        out = out.decode() if isinstance(out, bytes) else out
        print(out, end="")
        print(f"WEDGED: no response in {args.timeout:.0f}s "
              f"(last output above, if any)")
        return 2
    dt = time.time() - t0
    sys.stdout.write(proc.stdout)
    if proc.returncode != 0:
        sys.stderr.write(proc.stderr)
        print(f"ERROR: probe exited {proc.returncode} after {dt:.1f}s")
        return 3
    print(f"HEALTHY ({dt:.1f}s)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
