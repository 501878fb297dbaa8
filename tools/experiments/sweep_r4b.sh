#!/bin/bash
# Round-4 sweep phase 2: hybrid-off ablation completion + detect latency.
cd /root/repo
run() {
  name="$1"; shift; envs="$1"; shift; variant="$1"; shift; batch="${1:-16}"
  echo "=== $name"
  out=$(env $envs timeout 1500 python tools/profile_ablate.py "$variant" "$batch" 2>>/tmp/sweep_r4.err)
  echo "{\"name\": \"$name\", \"env\": \"$envs\", $(echo "$out" | tail -1 | cut -c2-)" >> /tmp/sweep_r4.jsonl
  echo "{\"name\": \"$name\", \"env\": \"$envs\", $(echo "$out" | tail -1 | cut -c2-)"
}
det() {
  name="$1"; shift
  echo "=== detect $name"
  out=$(timeout 1500 python tools/experiments/profile_detect.py "$name" 2>>/tmp/sweep_r4.err)
  echo "{\"detect\": \"$name\", $(echo "$out" | tail -1 | cut -c2-)" >> /tmp/sweep_r4.jsonl
  echo "{\"detect\": \"$name\", $(echo "$out" | tail -1 | cut -c2-)"
}
run joint_noattn_v2   "GDMAE_JOINT=1" noattn
run joint_mha_only    "GDMAE_JOINT=1 GDMAE_ABLATE_MHA=1" full
run joint_noplans     "GDMAE_JOINT=1" noplans
run joint_nocanvas    "GDMAE_JOINT=1" nocanvas+noplans
run joint_notokconv   "GDMAE_JOINT=1" notokconv
det full
det nonms
det nohead
det noattn
