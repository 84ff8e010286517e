#!/usr/bin/env bash
# Supervised SceneFlow pretrain recipe (reference DSMnet_train_sceneflow.sh).
set -e
ROOT=${ROOT:-/data/sceneflow}
NET=${NET:-dispnetcorr}       # dispnet/dispnetcorr/iresnet/gcnet/psmnet
LOSS=${LOSS:-supervised}
BT=${BT:-4}

python -m dsmnet_tpu.cli --mode train --net "$NET" --loss_name "$LOSS" \
  --batchsize "$BT" --epochs 100 --lr 0.0001 --lr_epoch0 40 --lr_stride 15 \
  --dataset flyingthings3d-tr --root "$ROOT" \
  --dataset_val flyingthings3d-te --root_val "$ROOT" \
  --val_freq 1 --print_freq 20 --dtype bfloat16 "$@"
