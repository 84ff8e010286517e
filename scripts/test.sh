#!/usr/bin/env bash
# Evaluation recipe (reference DSMnet_test.sh).
set -e
ROOT=${ROOT:-/data/kitti}
NET=${NET:-dispnetcorr}
WEIGHT=${WEIGHT:-}

python -m dsmnet_tpu.cli --mode test --net "$NET" --loss_name supervised \
  --dataset kitti2015-tr --root "$ROOT" ${WEIGHT:+--path_weight "$WEIGHT"} "$@"
