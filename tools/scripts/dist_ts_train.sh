#!/usr/bin/env bash
# Teacher-student two-stage launch (mirrors the reference
# tools/scripts/dist_ts_train.sh): train a first-stage detector, then train
# the two-stage refinement model with the first stage loaded via partial
# restore and frozen (FREEZE_LAYERS in the *_ts / graph_rcnn_* config).
#
# Usage: dist_ts_train.sh <stage1_cfg> <ts_cfg> [train.py args...]
#   e.g. dist_ts_train.sh cfgs/kitti_models/second_mini.yaml \
#            cfgs/kitti_models/graph_rcnn_vo.yaml --epochs 80
set -euo pipefail
STAGE1_CFG=${1:?usage: dist_ts_train.sh <stage1_cfg.yaml> <ts_cfg.yaml> [args...]}
TS_CFG=${2:?usage: dist_ts_train.sh <stage1_cfg.yaml> <ts_cfg.yaml> [args...]}
shift 2
TOOLS_DIR=$(dirname "$0")/..

python "$TOOLS_DIR/train.py" --cfg_file "$STAGE1_CFG" "$@"

STAGE1_REL=${STAGE1_CFG#*cfgs/}
STAGE1_REL=${STAGE1_REL%.yaml}
CKPT=$(ls -t "$TOOLS_DIR/../output/cfgs/$STAGE1_REL/default/ckpt/"checkpoint_epoch_*.pkl | head -1)

python "$TOOLS_DIR/train.py" --cfg_file "$TS_CFG" --extra_tag ts_default \
    --pretrained_model "$CKPT" "$@"
python "$TOOLS_DIR/test.py" --cfg_file "$TS_CFG" --extra_tag ts_default "$@"
