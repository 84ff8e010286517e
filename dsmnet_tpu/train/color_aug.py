"""Device-side batched color augmentation for the self-supervised pipeline.

The reference applies ColorJitter + Lighting + Normalize per-sample on
the CPU inside the train loop (stereo_selfsupervised.py:59-71,
myTransforms/aug_color.py).  TPU-native version: everything is a batched
jnp transform driven by a PRNG key and lives *inside* the jitted train
step, so the augmented batch never leaves HBM.

Semantics per sample (aug_color.py:103-217, same_group=True):
  * a random order of [Brightness, Contrast, Saturation, Gamma], each
    with one scalar parameter shared across the L/R image pair:
      brightness: x * (1 + u*0.4)         u ~ U(-0.5, 0.5)
      contrast:   x + u*0.4               (reference 'Contrast' is additive)
      saturation: x + grayscale(x) * u*0.4
      gamma:      x ** (1 + u*0.4)
    then clamp to [0, 1]
  * Lighting: AlexNet PCA noise, alpha ~ N(0, 0.1), shared across the
    pair, clamp [0, 1] (aug_color.py:66-99)
  * Normalize: ImageNet mean/std per 3-channel group
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["color_augment_batch", "normalize_imagenet", "unnormalize_imagenet"]

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)

# aug_color.py:8-15
_PCA_EIGVAL = jnp.asarray([0.2175, 0.0188, 0.0045])
_PCA_EIGVEC = jnp.asarray(
    [
        [-0.5675, 0.7192, 0.4009],
        [-0.5808, -0.0045, -0.8140],
        [-0.5836, -0.6948, 0.4203],
    ]
)


def _grayscale(x):
    """ITU-R 601 luma, replicated to 3 channels (aug_color.py:105-117)."""
    g = 0.299 * x[..., 0:1] + 0.587 * x[..., 1:2] + 0.114 * x[..., 2:3]
    return jnp.concatenate([g, g, g], axis=-1)


def _apply_op(op_idx, x, u):
    """One jitter op on a (H, W, 6) L/R stack with shared parameter u."""

    def brightness(x):
        return x * (1.0 + u * 0.4)

    def contrast(x):
        return x + u * 0.4

    def saturation(x):
        gs = jnp.concatenate([_grayscale(x[..., :3]), _grayscale(x[..., 3:6])], -1)
        return x + gs * (u * 0.4)

    def gamma(x):
        return jnp.clip(x, 1e-6, 1.0) ** (1.0 + u * 0.4)

    return lax.switch(op_idx, [brightness, contrast, saturation, gamma], x)


def _jitter_one(key, x):
    """Random-order jitter of one (H, W, 6) sample (aug_color.py:186-217)."""
    k_perm, k_u = jax.random.split(key)
    order = jax.random.permutation(k_perm, 4)
    us = jax.random.uniform(k_u, (4,), minval=-0.5, maxval=0.5)

    def body(i, x):
        return _apply_op(order[i], x, us[i])

    x = lax.fori_loop(0, 4, body, x)
    return jnp.clip(x, 0.0, 1.0)


def _lighting_one(key, x, alphastd=0.1):
    """PCA lighting noise on one (H, W, 6) sample, shared alpha
    (aug_color.py:66-99)."""
    alpha = jax.random.normal(key, (3,)) * alphastd
    rgb = jnp.sum(_PCA_EIGVEC * alpha[None, :] * _PCA_EIGVAL[None, :], axis=1)
    x = x + jnp.concatenate([rgb, rgb])[None, None, :]
    return jnp.clip(x, 0.0, 1.0)


def normalize_imagenet(x, groups: int = 2):
    """Per-3-channel-group ImageNet normalization (myTransforms/__init__.py:8)."""
    mean = jnp.asarray(IMAGENET_MEAN * groups, x.dtype)
    std = jnp.asarray(IMAGENET_STD * groups, x.dtype)
    return (x - mean) / std


def unnormalize_imagenet(x, groups: int = 2):
    mean = jnp.asarray(IMAGENET_MEAN * groups, x.dtype)
    std = jnp.asarray(IMAGENET_STD * groups, x.dtype)
    return x * std + mean


def color_augment_batch(key, batch, jitter: bool = True):
    """ColorJitter + Lighting + Normalize on a (N, H, W, 6) [0,1] batch.

    Each sample draws its own parameters, shared across its L/R pair
    (Stereo_color with same_group=True, myTransforms/__init__.py:112-117).
    """
    n = batch.shape[0]
    if jitter:
        kj, kl = jax.random.split(key)
        batch = jax.vmap(_jitter_one)(jax.random.split(kj, n), batch)
        batch = jax.vmap(_lighting_one)(jax.random.split(kl, n), batch)
    return normalize_imagenet(batch, groups=2)
