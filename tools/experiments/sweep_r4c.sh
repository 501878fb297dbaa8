#!/bin/bash
# Round-4 phase 3: skeleton decomposition at the 177 ms baseline.
cd /root/repo
run() {
  name="$1"; shift; envs="$1"; shift; variant="$1"; shift; batch="${1:-16}"
  echo "=== $name"
  out=$(env $envs timeout 1500 python tools/profile_ablate.py "$variant" "$batch" 2>>/tmp/sweep_r4.err)
  echo "{\"name\": \"$name\", \"env\": \"$envs\", $(echo "$out" | tail -1 | cut -c2-)" >> /tmp/sweep_r4.jsonl
  echo "{\"name\": \"$name\", \"env\": \"$envs\", $(echo "$out" | tail -1 | cut -c2-)"
}
run skeleton   "" "novfe+noattn+noplans+nofuse+noloss+nomask"
run conv1x1    "" conv1x1
run noconvs    "" noconv+noplans
run nocanvas2  "" nocanvas+noplans
