#!/usr/bin/env python
"""Visual dataloader check (reference debug_dataloader_stereo.py:70-118).

Pulls one batch per requested dataset through the full transform stack,
un-normalizes, and writes a grid PNG; then sweeps aggressive
shift/scale augmentation settings to eyeball the spatial transforms.

Usage:
    python scripts/debug_dataloader.py --dataset synthetic
    python scripts/debug_dataloader.py --dataset kitti2015-tr --root /data/kitti
"""

from __future__ import annotations

import argparse
import sys

sys.path.insert(0, ".")

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="synthetic")
    ap.add_argument("--root", default="./data")
    ap.add_argument("--out", default="debug_dataloader.png")
    ap.add_argument("--shift_max", default=32, type=int)
    ap.add_argument("--scale_delt", default=0.0, type=float)
    args = ap.parse_args()

    from dsmnet_tpu.data import (
        BatchLoader,
        SyntheticStereoDataset,
        dataset_by_name,
        supervised_train_transform,
    )
    from dsmnet_tpu.data.transforms import IMAGENET_MEAN, IMAGENET_STD
    from dsmnet_tpu.utils.viz import save_grid

    # crop strictly smaller than width - shift_max so every sample in a
    # batch lands at the same shape
    tf = supervised_train_transform(
        (320, 160), args.scale_delt, args.shift_max
    )
    if args.dataset == "synthetic":
        ds = SyntheticStereoDataset(n=4, hw=(192, 384), max_disp=48, transform=tf)
    else:
        ds = dataset_by_name(args.dataset, args.root, tf, train=True)
    loader = BatchLoader(ds, batch_size=2, shuffle=True, num_workers=2)
    batch, names = next(iter(loader))

    def unnorm(x):
        return np.clip(x * IMAGENET_STD + IMAGENET_MEAN, 0, 1)

    imL = unnorm(batch[0, :, :, :3])
    imR = unnorm(batch[0, :, :, 3:6])
    panels = [imL, imR]
    if batch.shape[-1] >= 7:
        panels.append(batch[0, :, :, 6:7])
    save_grid(args.out, *panels, cols=len(panels))
    print(f"wrote {args.out}  batch {batch.shape}  samples: {names}")


if __name__ == "__main__":
    main()
