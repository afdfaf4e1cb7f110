#!/bin/bash
# Round-4 lever sequence (VERDICT item 1): member baseline re-check, then
# patch_group {2,4} WITH remat (the r3 measurements were remat-off and the
# group=2 OOM predates remat interest).  Serial — never stack remote
# compiles.  Run: bash tools/r4a_sequence.sh 2>&1 | tee /tmp/r4a.log
set -x
cd "$(dirname "$0")/.."

echo "=== baseline member_run (defaults) ==="
timeout 2400 python tools/probe_member.py --time --analyze

echo "=== patch_group=2 + remat: AOT memory ==="
PROBE_GROUP=2 PROBE_REMAT=1 timeout 2400 python tools/probe_member.py --analyze

echo "=== patch_group=2 + remat: steady-state ==="
PROBE_GROUP=2 PROBE_REMAT=1 timeout 3000 python tools/probe_member.py --time

echo "=== patch_group=4 + remat: AOT memory ==="
PROBE_GROUP=4 PROBE_REMAT=1 timeout 2400 python tools/probe_member.py --analyze

echo "=== patch_group=2 no-remat: AOT memory (crossing-concat era recheck) ==="
PROBE_GROUP=2 timeout 2400 python tools/probe_member.py --analyze
