#!/usr/bin/env bash
# Self-supervised KITTI recipe (reference DSMnet_train_kitti.sh: Cap_ds-mask).
set -e
ROOT=${ROOT:-/data/kitti}
NET=${NET:-dispnetcorr}
LOSS=${LOSS:-Cap_ds-mask}
BT=${BT:-4}

python -m dsmnet_tpu.cli --mode train --net "$NET" --loss_name "$LOSS" \
  --batchsize "$BT" --epochs 2000 --lr 0.0001 --lr_epoch0 500 --lr_stride 500 \
  --dataset kitti2015-tr --root "$ROOT" \
  --dataset_val kitti2012-tr --root_val "$ROOT" \
  --val_freq 20 --print_freq 20 --dtype bfloat16 "$@"
