"""Finite-difference and edge-aware smoothness primitives (NHWC).

Pure-function ports of the reference's loss primitives
(losses/loss.py:36-147).  Padding conventions follow the reference
exactly: first differences pad one zero at the right/bottom, second and
ratio differences pad one zero on both sides of the differentiated axis.

All functions take images as (N,H,W,C) and disparities as (N,H,W,1).
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = [
    "diff1_dx",
    "diff1_dy",
    "diff2_dx",
    "diff2_dy",
    "diff_z_dx",
    "diff_z_dy",
    "c_imdiff1",
    "c_ds1",
    "c_ds2",
    "c_ds3",
    "c_ds3t",
    "c_ds3t1",
]


def diff1_dx(x: jnp.ndarray) -> jnp.ndarray:
    """First difference along W, zero-padded right (loss.py:36-39)."""
    d = x[:, :, 1:, :] - x[:, :, :-1, :]
    return jnp.pad(d, ((0, 0), (0, 0), (0, 1), (0, 0)))


def diff1_dy(x: jnp.ndarray) -> jnp.ndarray:
    """First difference along H, zero-padded bottom (loss.py:41-44)."""
    d = x[:, 1:, :, :] - x[:, :-1, :, :]
    return jnp.pad(d, ((0, 0), (0, 1), (0, 0), (0, 0)))


def diff2_dx(x: jnp.ndarray) -> jnp.ndarray:
    """Second difference along W, zero-padded both sides (loss.py:46-49)."""
    d = x[:, :, 2:, :] + x[:, :, :-2, :] - 2.0 * x[:, :, 1:-1, :]
    return jnp.pad(d, ((0, 0), (0, 0), (1, 1), (0, 0)))


def diff2_dy(x: jnp.ndarray) -> jnp.ndarray:
    """Second difference along H, zero-padded both sides (loss.py:51-54)."""
    d = x[:, 2:, :, :] + x[:, :-2, :, :] - 2.0 * x[:, 1:-1, :, :]
    return jnp.pad(d, ((0, 0), (1, 1), (0, 0), (0, 0)))


def diff_z_dx(x: jnp.ndarray) -> jnp.ndarray:
    """Ratio-based curvature along W: x/x_right + x/x_left - 2 (loss.py:56-59)."""
    d = x[:, :, 1:-1, :] / x[:, :, 2:, :] + x[:, :, 1:-1, :] / x[:, :, :-2, :] - 2.0
    return jnp.pad(d, ((0, 0), (0, 0), (1, 1), (0, 0)))


def diff_z_dy(x: jnp.ndarray) -> jnp.ndarray:
    """Ratio-based curvature along H (loss.py:61-64)."""
    d = x[:, 1:-1, :, :] / x[:, 2:, :, :] + x[:, 1:-1, :, :] / x[:, :-2, :, :] - 2.0
    return jnp.pad(d, ((0, 0), (1, 1), (0, 0), (0, 0)))


def c_imdiff1(img: jnp.ndarray, img_warp: jnp.ndarray) -> jnp.ndarray:
    """L1 of gradient differences between an image and its warp (loss.py:66-69)."""
    return jnp.abs(diff1_dx(img) - diff1_dx(img_warp)) + jnp.abs(
        diff1_dy(img) - diff1_dy(img_warp)
    )


def c_ds1(img: jnp.ndarray, disp: jnp.ndarray) -> jnp.ndarray:
    """Monodepth-style 1st-order edge-aware smoothness (loss.py:71-83)."""
    wx = jnp.exp(-jnp.sum(jnp.abs(diff1_dx(img)), axis=-1, keepdims=True))
    wy = jnp.exp(-jnp.sum(jnp.abs(diff1_dy(img)), axis=-1, keepdims=True))
    return jnp.abs(diff1_dx(disp)) * wx + jnp.abs(diff1_dy(disp)) * wy


def c_ds2(img: jnp.ndarray, disp: jnp.ndarray) -> jnp.ndarray:
    """2nd-order edge-aware smoothness (loss.py:85-97)."""
    wx = jnp.exp(-jnp.sum(jnp.abs(diff2_dx(img)), axis=-1, keepdims=True))
    wy = jnp.exp(-jnp.sum(jnp.abs(diff2_dy(img)), axis=-1, keepdims=True))
    return jnp.abs(diff2_dx(disp)) * wx + jnp.abs(diff2_dy(disp)) * wy


def _mean_normalized_edge_weights(img: jnp.ndarray):
    """exp(-max_c |dI| / (0.5 mean |dI|)) weights shared by the C_ds3
    family (loss.py:104-109)."""
    idx = jnp.abs(diff1_dx(img))
    idy = jnp.abs(diff1_dy(img))
    m_idx = jnp.mean(idx, axis=(1, 2, 3), keepdims=True)
    m_idy = jnp.mean(idy, axis=(1, 2, 3), keepdims=True)
    wx = jnp.exp(-jnp.max(idx, axis=-1, keepdims=True) / (0.5 * m_idx))
    wy = jnp.exp(-jnp.max(idy, axis=-1, keepdims=True) / (0.5 * m_idy))
    return wx, wy


def c_ds3(img: jnp.ndarray, disp: jnp.ndarray) -> jnp.ndarray:
    """Ratio-based smoothness on |d|+1 with mean-normalized max-channel
    edge weights (loss.py:99-114)."""
    d = jnp.abs(disp) + 1.0
    ddx = jnp.clip(jnp.abs(diff_z_dx(d)), 0.0, 10.0)
    ddy = jnp.clip(jnp.abs(diff_z_dy(d)), 0.0, 10.0)
    wx, wy = _mean_normalized_edge_weights(img)
    return ddx * wx + ddy * wy


def c_ds3t(img: jnp.ndarray, disp: jnp.ndarray) -> jnp.ndarray:
    """C_ds3t variant (loss.py:132-147): identical to c_ds3 (the reference
    keeps both; retained for inventory parity)."""
    return c_ds3(img, disp)


def c_ds3t1(img: jnp.ndarray, disp: jnp.ndarray) -> jnp.ndarray:
    """C_ds3t1 variant (loss.py:116-130): first-order |dd| with the
    mean-normalized edge weights."""
    wx, wy = _mean_normalized_edge_weights(img)
    return jnp.abs(diff1_dx(disp)) * wx + jnp.abs(diff1_dy(disp)) * wy
