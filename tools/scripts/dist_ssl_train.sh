#!/usr/bin/env bash
# Self-supervised pretrain -> detection fine-tune pipeline (mirrors the
# reference dist_ssl_train.sh flow): pretrain with the *_ssl config, then
# fine-tune loading the epoch-30 encoder via partial restore.
set -euo pipefail
CFG_DIR=${1:?usage: dist_ssl_train.sh <cfg_dir e.g. cfgs/kitti_models>}
shift
python "$(dirname "$0")/../train.py" --cfg_file "$CFG_DIR/gd_mae_ssl.yaml" "$@"
SSL_TAG=$(basename "$CFG_DIR")
CKPT=$(ls -t "$(dirname "$0")/../../output/$SSL_TAG/gd_mae_ssl/default/ckpt/"checkpoint_epoch_*.pkl | head -1)
python "$(dirname "$0")/../train.py" --cfg_file "$CFG_DIR/gd_mae.yaml" \
    --pretrained_model "$CKPT" "$@"
python "$(dirname "$0")/../test.py" --cfg_file "$CFG_DIR/gd_mae.yaml" "$@"
