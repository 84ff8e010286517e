"""Command-line entry point (reference main.py:14-50 + deploy/deploy.py).

Modes: train / finetune / test / submit / deploy.  Dataset, model and
loss selection use the same compositional string DSLs as the reference
('kitti2015-tr_kitti2012-tr' dataset concat, '<loss>[-mask]' loss spec).

Extra TPU-native flags: --mesh-data/--mesh-model select the device mesh;
--dataset synthetic trains on the procedural dataset (no files needed).

Usage:
    python -m dsmnet_tpu.cli --mode train --net dispnetcorr \
        --dataset flyingthings3d-tr --root /data/sceneflow ...
    python -m dsmnet_tpu.cli --mode deploy --net dispnetcorr \
        --path_weight w.msgpack --path_left 10L.png --path_right 10R.png
"""

from __future__ import annotations

import argparse
import logging

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="TPU-native deep stereo matching")
    p.add_argument("--mode", default="train",
                   choices=["train", "finetune", "test", "submit", "deploy"])
    p.add_argument("--epochs", default=150, type=int)
    p.add_argument("--dataset", default="kitti2015-tr", type=str,
                   help="'_'-joined dataset names, or 'synthetic'")
    p.add_argument("--root", default="./kitti", type=str)
    p.add_argument("--dataset_val", default="kitti2015-tr", type=str)
    p.add_argument("--root_val", default="", type=str)
    p.add_argument("--val_freq", default=1, type=int)
    p.add_argument("--print_freq", default=20, type=int)
    p.add_argument("--batchsize", default=1, type=int)
    p.add_argument("--loss_name", default="supervised", type=str,
                   help="supervised/(depthmono/SsSMnet/Cap_ds_lr)[-mask]")
    p.add_argument("--net", default="dispnet", type=str,
                   help="dispnet/dispnetcorr/iresnet/gcnet/psmnet")
    p.add_argument("--maxdisparity", default=192, type=int)
    p.add_argument("--path_weight", default="", type=str)
    p.add_argument("--flag_model", default="", type=str)
    p.add_argument("--lr", default=1e-4, type=float)
    p.add_argument("--beta1", default=0.9, type=float)
    p.add_argument("--beta2", default=0.999, type=float)
    p.add_argument("--lr_epoch0", default=50, type=int)
    p.add_argument("--lr_stride", default=20, type=int)
    p.add_argument("--output", default="output", type=str)
    p.add_argument("--seed", default=0, type=int)
    p.add_argument("--crop_w", default=768, type=int)
    p.add_argument("--crop_h", default=384, type=int)
    p.add_argument("--shift_max", default=32, type=int)
    p.add_argument("--scale_delt", default=0.0, type=float)
    p.add_argument("--num_workers", default=4, type=int)
    p.add_argument("--plot_curves", action="store_true")
    p.add_argument("--dtype", default="float32", choices=["float32", "bfloat16"],
                   help="computation dtype for the conv stacks (bfloat16 = MXU-native)")
    p.add_argument("--profile_dir", default="", type=str,
                   help="write a jax.profiler trace of a few train steps here")
    p.add_argument("--remat", action="store_true",
                   help="rematerialize heavy blocks (trade FLOPs for HBM)")
    # TPU-native parallelism
    p.add_argument("--mesh-data", default=0, type=int,
                   help="data-parallel mesh size (0 = all devices)")
    p.add_argument("--mesh-model", default=1, type=int,
                   help="spatial/model mesh size")
    p.add_argument("--multihost", action="store_true",
                   help="initialize jax.distributed; shard the dataset and "
                        "batches per host (pod-slice training)")
    p.add_argument("--coordinator", default="", type=str,
                   help="multihost: coordinator address host:port "
                        "(empty = TPU auto-detection)")
    p.add_argument("--num_processes", default=0, type=int)
    p.add_argument("--process_id", default=-1, type=int)
    # deploy
    p.add_argument("--path_left", default="10L.png", type=str)
    p.add_argument("--path_right", default="10R.png", type=str)
    p.add_argument("--flip", action="store_true",
                   help="deploy: compute the right-view disparity")
    return p


def _make_loaders(args, spec):
    from .data import (
        BatchLoader,
        SyntheticStereoDataset,
        dataset_by_name,
        eval_transform,
        selfsup_eval_transform,
        selfsup_train_transform,
        supervised_train_transform,
    )

    size_crop = (args.crop_w, args.crop_h)
    root_val = args.root_val or args.root
    supervised = spec.supervised

    if args.mode in ("test", "submit"):
        tf = eval_transform() if supervised else selfsup_eval_transform()
        if args.dataset == "synthetic":
            ds = SyntheticStereoDataset(n=16, transform=tf)
        else:
            ds = dataset_by_name(args.dataset, args.root, tf, train=False)
        return None, BatchLoader(ds, args.batchsize, shuffle=False,
                                 num_workers=args.num_workers)

    if supervised:
        tf_train = supervised_train_transform(size_crop, args.scale_delt, args.shift_max)
        tf_val = eval_transform()
    else:
        tf_train = selfsup_train_transform(size_crop, args.scale_delt, args.shift_max)
        tf_val = selfsup_eval_transform()

    if args.dataset == "synthetic":
        ds_train = SyntheticStereoDataset(n=64, transform=tf_train)
        ds_val = SyntheticStereoDataset(n=8, transform=tf_val, seed=1)
    else:
        ds_train = dataset_by_name(args.dataset, args.root, tf_train, train=True)
        ds_val = dataset_by_name(args.dataset_val, root_val, tf_val, train=False)
    loader_train = BatchLoader(ds_train, args.batchsize, shuffle=True,
                               num_workers=args.num_workers, seed=args.seed)
    loader_val = BatchLoader(ds_val, args.batchsize, shuffle=False,
                             num_workers=args.num_workers)
    return loader_train, loader_val


def _deploy(args) -> None:
    """Single-pair inference (deploy/deploy.py:15-68)."""
    import jax
    import jax.numpy as jnp

    from .data.io import imread
    from .models import create_model
    from .train.color_aug import normalize_imagenet
    from .train.state import create_train_state, load_weights

    imgL = np.float32(imread(args.path_left)) / 255.0
    imgR = np.float32(imread(args.path_right)) / 255.0
    if args.flip:
        imgL, imgR = np.flip(imgR, 1).copy(), np.flip(imgL, 1).copy()

    model = create_model(args.net, args.maxdisparity)
    state, _ = create_train_state(model, jax.random.PRNGKey(0))
    if args.path_weight:
        params = load_weights(args.path_weight, state.params)
        state = state.replace(params=params)

    iL = normalize_imagenet(jnp.asarray(imgL)[None], groups=1)
    iR = normalize_imagenet(jnp.asarray(imgR)[None], groups=1)
    variables = {"params": state.params}
    if state.batch_stats:
        variables["batch_stats"] = state.batch_stats

    @jax.jit
    def fwd(variables, iL, iR):
        _, disps = model.apply(variables, iL, iR, train=False, clamp=True)
        return disps[0]

    disp = np.asarray(fwd(variables, iL, iR)[0, :, :, 0])

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    if args.flip:
        plt.imsave("dispR.png", np.flip(disp, axis=-1))
    else:
        plt.imsave("dispL.png", disp)
    print(f"wrote disp{'R' if args.flip else 'L'}.png  "
          f"min={disp.min():.2f} max={disp.max():.2f}")


def main(argv=None) -> None:
    logging.basicConfig(
        level=logging.INFO, format=" %(asctime)s - %(levelname)s - %(message)s"
    )
    # honor an explicit platform override even when a PJRT plugin forced its
    # own platform during interpreter startup (e.g. DSMNET_PLATFORM=cpu)
    import os

    plat = os.environ.get("DSMNET_PLATFORM")
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)
    args = build_parser().parse_args(argv)

    if args.multihost:
        from .parallel.multihost import init_distributed

        init_distributed(
            coordinator_address=args.coordinator or None,
            num_processes=args.num_processes or None,
            process_id=args.process_id if args.process_id >= 0 else None,
        )

    if args.mode == "deploy":
        _deploy(args)
        return

    from .losses import parse_loss_name
    from .models import create_model
    from .train import TrainConfig, Trainer

    probe = create_model(args.net, args.maxdisparity)
    spec = parse_loss_name(args.loss_name, probe.count_levels, 1)
    loader_train, loader_val = _make_loaders(args, spec)

    if args.multihost:
        import jax

        if jax.process_count() > 1:
            from .parallel.multihost import shard_dataset_for_host

            for loader in (loader_train, loader_val):
                if loader is not None:
                    shard_dataset_for_host(loader.dataset)

    cfg = TrainConfig(
        mode=args.mode, epochs=args.epochs, net=args.net,
        maxdisparity=args.maxdisparity, loss_name=args.loss_name, lr=args.lr,
        beta1=args.beta1, beta2=args.beta2, lr_epoch0=args.lr_epoch0,
        lr_stride=args.lr_stride, val_freq=args.val_freq,
        print_freq=args.print_freq, batchsize=args.batchsize,
        output=args.output, dataset=args.dataset, dataset_val=args.dataset_val,
        path_weight=args.path_weight, flag_model=args.flag_model,
        seed=args.seed, plot_curves=args.plot_curves, dtype=args.dtype,
        profile_dir=args.profile_dir, remat=args.remat,
    )

    mesh = None
    if args.mesh_data != 1 or args.mesh_model != 1 or args.multihost:
        import jax

        from .parallel import make_mesh

        n = len(jax.devices())
        data = args.mesh_data or max(1, n // max(args.mesh_model, 1))
        if data * args.mesh_model <= n:
            mesh = make_mesh(data=data, model=args.mesh_model)

    trainer = Trainer(cfg, loader_train=loader_train, loader_val=loader_val, mesh=mesh)
    if args.mode == "submit":
        trainer.submit()
    else:
        trainer.start()


if __name__ == "__main__":
    main()
