"""Soft-argmin / disparity regression over a cost dimension.

GCNet takes softmax over *negated* costs then the expectation
sum_d d * p(d) (reference models/gcnet.py:104-111); PSMNet applies the
softmax to its classifier outputs directly (stackhourglass.py:156-166,
submodule.py:56-63).  The expectation is an MXU-friendly contraction
with the arange vector.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["soft_argmin"]


def soft_argmin(cost: jnp.ndarray, negate: bool = True) -> jnp.ndarray:
    """Expected disparity from a (N, D, H, W) cost slab -> (N, H, W, 1).

    ``negate=True`` matches GCNet (softmax of -cost, low cost = likely);
    ``negate=False`` matches PSMNet's classifier-probability convention.
    """
    n, d, h, w = cost.shape
    # softmax + expectation in f32 regardless of the compute dtype: the
    # expectation over up to 192 bins is precision-sensitive
    cost = cost.astype(jnp.float32)
    logits = -cost if negate else cost
    p = jax.nn.softmax(logits, axis=1)
    dvals = jnp.arange(d, dtype=p.dtype)
    out = jnp.einsum("ndhw,d->nhw", p, dvals)
    return out[..., None]
