#!/bin/bash
# Round-4 perf sweep: controlled single-variable A/Bs of the MAE pretrain
# step at HEAD.  Each line: name, env, profile_ablate variant, batch.
# Results append to /tmp/sweep_r4.jsonl (with the contention probe).
cd /root/repo
run() {
  name="$1"; shift
  envs="$1"; shift
  variant="$1"; shift
  batch="${1:-16}"
  echo "=== $name (env: $envs)"
  out=$(env $envs timeout 1500 python tools/profile_ablate.py "$variant" "$batch" 2>>/tmp/sweep_r4.err)
  echo "{\"name\": \"$name\", \"env\": \"$envs\", $(echo "$out" | tail -1 | cut -c2-)"
  echo "{\"name\": \"$name\", \"env\": \"$envs\", $(echo "$out" | tail -1 | cut -c2-)" >> /tmp/sweep_r4.jsonl
}
run joint_full        "GDMAE_JOINT=1" full
run joint_nohostpil   "GDMAE_JOINT=1 GDMAE_BENCH_HOST_PIL=0 GDMAE_BENCH_HOST_GT=0" full
run joint_nohybrid    "GDMAE_JOINT=1 GDMAE_BENCH_HYBRID=0" full
run joint_densespconv "GDMAE_JOINT=1 GDMAE_SET=BACKBONE_3D.TPU_SPARSE_CONV=false" full
run bucket_nohybrid   "GDMAE_BENCH_HYBRID=0" full
run joint_noattn      "GDMAE_JOINT=1" noattn
run joint_nofuse      "GDMAE_JOINT=1" nofuse
run joint_noloss      "GDMAE_JOINT=1" noloss
run joint_novfe       "GDMAE_JOINT=1" novfe
run joint_nomask      "GDMAE_JOINT=1" nomask
run joint_sgd         "GDMAE_JOINT=1" sgd
run joint_batch32     "GDMAE_JOINT=1" full 32
run joint_erf         "GDMAE_JOINT=1 GDMAE_EXACT_GELU=1" full
run joint_minscatter  "GDMAE_JOINT=1 GDMAE_SEGMAX_BWD=minscatter" full
