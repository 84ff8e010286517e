"""Memory-lean trilinear-upsample + soft-argmin disparity regression.

PSMNet lifts each 1/4-resolution classifier cost to full resolution with
an align-corners trilinear upsample and immediately collapses the
disparity axis with softmax + expectation
(psmnet/stackhourglass.py:152-166).  Materializing the upsampled
(N, D, H, W) logits costs ~226 MB per head at 384x768/D=192 — three
heads per forward.

The exact same math is computed here in H-chunks: the cheap D-upsample
runs once at coarse spatial resolution; each chunk of output rows then
expands to full resolution (a few MB), is reduced to disparity
immediately, and is discarded.  ``lax.map`` over chunks keeps the live
intermediate at chunk size while XLA pipelines the chunk loop.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from .resize import interp_matrix
from .softargmin import soft_argmin

__all__ = ["trilinear_soft_argmin"]


def trilinear_soft_argmin(
    cost: jnp.ndarray,
    out_dhw: tuple[int, int, int],
    negate: bool = False,
    h_chunk: int = 16,
) -> jnp.ndarray:
    """soft_argmin(resize_trilinear(cost, out_dhw)) without materializing
    the upsampled volume.

    cost: (N, Dc, Hc, Wc, 1); returns (N, H, W, 1) float32.
    """
    n, dc, hc, wc, c1 = cost.shape
    assert c1 == 1
    d, h, w = out_dhw
    x = cost[..., 0].astype(jnp.float32)  # (N, Dc, Hc, Wc)

    Ad = jnp.asarray(interp_matrix(d, dc))
    Ah = jnp.asarray(interp_matrix(h, hc))
    Aw = jnp.asarray(interp_matrix(w, wc))

    # D- and H-upsamples run once at coarse W (the H-up output is only
    # D*H*Wc floats); chunking starts at the W-up so each chunk reads
    # just its own rows instead of re-reading the whole D-up volume
    x = jnp.einsum("ed,ndhw->nehw", Ad, x)  # (N, D, Hc, Wc)
    x = jnp.einsum("ih,ndhw->ndiw", Ah, x)  # (N, D, H, Wc)

    if h % h_chunk:
        h_chunk = 1
    n_chunks = h // h_chunk
    xc = jnp.moveaxis(x.reshape(n, d, n_chunks, h_chunk, wc), 2, 0)

    dvals = jnp.arange(d, dtype=jnp.float32)

    def one_chunk(rows):                                # (N, D, hc_chunk, Wc)
        full = jnp.einsum("jw,ndiw->ndij", Aw, rows)    # (N, D, hc_chunk, W)
        logits = -full if negate else full
        p = jax.nn.softmax(logits, axis=1)
        return jnp.einsum("ndij,d->nij", p, dvals)      # (N, hc_chunk, W)

    out = lax.map(one_chunk, xc)                        # (n_chunks, N, hc_chunk, W)
    out = jnp.moveaxis(out, 0, 1).reshape(n, h, w)
    return out[..., None]
