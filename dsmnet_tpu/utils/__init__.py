"""Utilities: honest device timing, offline evaluation metrics."""

from .benchtime import time_op, time_pytree_step
from .evaluate import compute_errors, evaluate_pair, warp_pixel_error

__all__ = [
    "time_op",
    "time_pytree_step",
    "compute_errors",
    "evaluate_pair",
    "warp_pixel_error",
]
