"""SSIM similarity map, matching the reference's channel-collapsing variant.

The reference's ``_ssim`` (losses/SSIM.py:24-42) divides the Gaussian
window by the channel count and convolves with ``groups=1``, which is
mathematically a Gaussian blur of the *channel mean*: all statistics
(mu, sigma) are computed on channel-averaged quantities and the output
map has a single channel.  Window 11, sigma 1.5, C1=0.01^2, C2=0.03^2.

TPU-first: the blur is two separable 1-D convolutions on a single-channel
NHWC tensor — cheap VPU/MXU work XLA fuses into the surrounding loss.
"""

from __future__ import annotations

import functools
import math

import jax.numpy as jnp
import numpy as np
from jax import lax

__all__ = ["ssim_map", "gaussian_kernel_1d"]


@functools.lru_cache(maxsize=None)
def gaussian_kernel_1d(window_size: int = 11, sigma: float = 1.5) -> np.ndarray:
    """Normalized 1-D Gaussian taps (reference: losses/SSIM.py:6-8)."""
    xs = np.arange(window_size) - window_size // 2
    g = np.exp(-(xs.astype(np.float64) ** 2) / (2.0 * sigma**2))
    return (g / g.sum()).astype(np.float32)


def _blur(x: jnp.ndarray, window_size: int, sigma: float) -> jnp.ndarray:
    """Separable Gaussian blur of a single-channel NHWC tensor, SAME pad."""
    g = jnp.asarray(gaussian_kernel_1d(window_size, sigma), dtype=x.dtype)
    kh = g.reshape(window_size, 1, 1, 1)  # HWIO
    kw = g.reshape(1, window_size, 1, 1)
    dn = lax.conv_dimension_numbers(x.shape, kh.shape, ("NHWC", "HWIO", "NHWC"))
    p = window_size // 2
    x = lax.conv_general_dilated(x, kh, (1, 1), [(p, p), (0, 0)], dimension_numbers=dn)
    x = lax.conv_general_dilated(x, kw, (1, 1), [(0, 0), (p, p)], dimension_numbers=dn)
    return x


def ssim_map(
    img1: jnp.ndarray,
    img2: jnp.ndarray,
    window_size: int = 11,
    sigma: float = 1.5,
) -> jnp.ndarray:
    """SSIM map of two NHWC images -> (N,H,W,1).

    Exactly the reference ``_ssim`` math (losses/SSIM.py:24-42): statistics
    over the channel-mean images; note sigma uses blur(mean_c(x*x)) -
    blur(mean_c(x))^2, i.e. cross-channel variance is folded in.
    """
    c1 = 0.01**2
    c2 = 0.03**2

    m1 = jnp.mean(img1, axis=-1, keepdims=True)
    m2 = jnp.mean(img2, axis=-1, keepdims=True)
    m11 = jnp.mean(img1 * img1, axis=-1, keepdims=True)
    m22 = jnp.mean(img2 * img2, axis=-1, keepdims=True)
    m12 = jnp.mean(img1 * img2, axis=-1, keepdims=True)

    mu1 = _blur(m1, window_size, sigma)
    mu2 = _blur(m2, window_size, sigma)
    sigma1_sq = _blur(m11, window_size, sigma) - mu1 * mu1
    sigma2_sq = _blur(m22, window_size, sigma) - mu2 * mu2
    sigma12 = _blur(m12, window_size, sigma) - mu1 * mu2

    num = (2.0 * mu1 * mu2 + c1) * (2.0 * sigma12 + c2)
    den = (mu1 * mu1 + mu2 * mu2 + c1) * (sigma1_sq + sigma2_sq + c2)
    return num / den
