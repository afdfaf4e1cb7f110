#!/bin/bash
# Sweep XLA:TPU layout/copy-fusion flags over the ztap conv chain
# (tools/probe_convvar.py, fwd+bwd) — each config is a fresh subprocess
# because libtpu absl flags are latched at process start.  Output:
# /tmp/r3h_flags.log, one "### name" header + probe JSON per config.
cd "$(dirname "$0")/.."
out=${1:-/tmp/r3h_flags.log}
: > "$out"
run() {
  name=$1; shift
  echo "### $name" >> "$out"
  XLA_FLAGS="$*" PROBE_VARIANTS=zpack timeout 900 \
    python tools/probe_convvar.py >> "$out" 2>&1
  echo "### rc=$?" >> "$out"
}
run baseline ""
run layout_policy0 --xla_tpu_layout_preference_policy=0
run layout_policy1 --xla_tpu_layout_preference_policy=1
run layout_policy2 --xla_tpu_layout_preference_policy=2
run aggressive_loop_layout --xla_tpu_enable_aggressive_loop_fusion_layout_opt=true
run fusion_layout_update --xla_tpu_enable_fusion_layout_update=true
run copy_fusion_thresh "--xla_tpu_copy_fusion_threshold=1073741824 --xla_tpu_copy_fusion_minimum_copy_size_in_bytes=0"
run layout_negotiation --xla_tpu_allow_layout_negotiation=true
run autotune_layouts --xla_tpu_autotune_layouts=true
echo "### sweep done" >> "$out"
