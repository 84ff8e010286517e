"""Training: state, jitted steps, metrics, device-side color aug, driver."""

from .color_aug import color_augment_batch, normalize_imagenet, unnormalize_imagenet
from .metrics import AverageMeter, d1_epe
from .state import (
    TrainState,
    create_train_state,
    load_checkpoint,
    load_weights,
    lr_for_epoch,
    make_optimizer,
    save_checkpoint,
)
from .steps import (
    make_selfsup_eval_step,
    make_selfsup_train_step,
    make_supervised_eval_step,
    make_supervised_train_step,
)
from .trainer import TrainConfig, Trainer

__all__ = [
    "color_augment_batch",
    "normalize_imagenet",
    "unnormalize_imagenet",
    "AverageMeter",
    "d1_epe",
    "TrainState",
    "create_train_state",
    "load_checkpoint",
    "load_weights",
    "lr_for_epoch",
    "make_optimizer",
    "save_checkpoint",
    "make_selfsup_eval_step",
    "make_selfsup_train_step",
    "make_supervised_eval_step",
    "make_supervised_train_step",
    "TrainConfig",
    "Trainer",
]
