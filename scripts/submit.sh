#!/usr/bin/env bash
# KITTI submission export (reference DSMnet_submit.sh).
set -e
ROOT=${ROOT:-/data/kitti}
NET=${NET:-dispnetcorr}
WEIGHT=${WEIGHT:-}

python -m dsmnet_tpu.cli --mode submit --net "$NET" --loss_name supervised \
  --dataset kitti2015-te --root "$ROOT" --flag_model "$NET" \
  ${WEIGHT:+--path_weight "$WEIGHT"} "$@"
