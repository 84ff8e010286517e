"""Input-pipeline throughput bench (VERDICT r4 task #5).

Measures sustained BatchLoader frames/s at the reference recipe shape —
384x768 crop out of a synthetic 400x832 decode + FULL supervised
augmentation (stereo shift w/ disparity fixup, crop, PCA lighting,
normalize; reference: Stereo_train, myTransforms/__init__.py:88 with
DataLoader(num_workers=4), stereo_supervised.py:29) — for worker counts
1/2/4, batch 4.  The bar: the loader must sustain at least the train
step's consumption rate (8.28 frames/s/chip at r4).

Run: python scripts/bench_loader.py [--frames 96]
"""

from __future__ import annotations

import argparse
import time

from dsmnet_tpu.data import BatchLoader, SyntheticStereoDataset
from dsmnet_tpu.data.transforms import supervised_train_transform


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=96)
    ap.add_argument("--batch", type=int, default=4)
    args = ap.parse_args()

    tf = supervised_train_transform(size_crop=(768, 384), shift_max=32)
    n = args.frames
    for nw in (1, 2, 4):
        ds = SyntheticStereoDataset(n=n, hw=(400, 832), max_disp=48,
                                    transform=tf)
        loader = BatchLoader(ds, batch_size=args.batch, shuffle=True,
                             num_workers=nw, seed=1)
        # warm one batch (thread spin-up, cv2 first-call init)
        it = iter(loader)
        next(it)
        t0 = time.perf_counter()
        frames = 0
        for imgs, _ in it:
            frames += imgs.shape[0]
        dt = time.perf_counter() - t0
        print(f"workers={nw}  {frames / dt:6.1f} frames/s  "
              f"({dt / (frames / args.batch) * 1e3:.1f} ms/batch of "
              f"{args.batch})")


if __name__ == "__main__":
    main()
