#!/usr/bin/env bash
# Supervised KITTI finetune from a pretrained weight (reference DSMnet_finetune.sh).
set -e
ROOT=${ROOT:-/data/kitti}
NET=${NET:-dispnetcorr}
WEIGHT=${WEIGHT:-./output/train_flyingthings3d-tr/${NET}_supervised/weight_best.msgpack}
BT=${BT:-4}

python -m dsmnet_tpu.cli --mode finetune --net "$NET" --loss_name supervised \
  --batchsize "$BT" --epochs 600 --lr 0.00002 --lr_epoch0 200 --lr_stride 200 \
  --dataset kitti2015-tr_kitti2012-tr --root "$ROOT" \
  --dataset_val kitti2015-tr_kitti2012-tr --root_val "$ROOT" \
  --path_weight "$WEIGHT" --val_freq 10 --print_freq 20 --dtype bfloat16 "$@"
