#!/usr/bin/env bash
# Self-supervised KITTI-raw recipe (reference DSMnet_train_kitti-raw.sh:
# depthmono-mask on the GT-free raw captures).
set -e
ROOT=${ROOT:-/data/kitti}
NET=${NET:-dispnetcorr}
LOSS=${LOSS:-depthmono-mask}
BT=${BT:-4}

python -m dsmnet_tpu.cli --mode train --net "$NET" --loss_name "$LOSS" \
  --batchsize "$BT" --epochs 200 --lr 0.0001 --lr_epoch0 50 --lr_stride 25 \
  --dataset kitti-raw --root "$ROOT" \
  --dataset_val kitti2015-tr --root_val "$ROOT" \
  --val_freq 5 --print_freq 20 --dtype bfloat16 "$@"
