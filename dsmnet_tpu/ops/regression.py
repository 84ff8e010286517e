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
import numpy as np
from jax import lax

from .resize import interp_matrix

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

    The D-upsample runs once at coarse spatial resolution.  The H- and
    W-upsamples run per H-chunk: align-corners interp rows have at most
    two nonzeros, so an output chunk of ``h_chunk`` rows reads only a
    small contiguous coarse-row window — the scan carries per-chunk
    (start, interp-window) pairs and dynamic-slices the D-up volume.
    (The r4 version materialized the full (N, D, H, Wc) H-up volume —
    226 MB f32 at b4 — and transposed it into chunk order; this version
    keeps the largest live array at the 56 MB D-up volume.)
    """
    n, dc, hc, wc, c1 = cost.shape
    assert c1 == 1
    d, h, w = out_dhw
    x = cost[..., 0].astype(jnp.float32)  # (N, Dc, Hc, Wc)

    Ad = jnp.asarray(interp_matrix(d, dc))
    Aw = jnp.asarray(interp_matrix(w, wc))

    x = jnp.einsum("ed,ndhw->nehw", Ad, x)  # (N, D, Hc, Wc)

    if h % h_chunk:
        h_chunk = 1
    n_chunks = h // h_chunk

    # per-chunk coarse-row windows of the (2-sparse) H interp matrix
    Ah = np.asarray(interp_matrix(h, hc))           # (h, hc)
    win = min(hc, int(np.ceil((h_chunk - 1) * max(hc - 1, 1)
                              / max(h - 1, 1))) + 2)
    starts = np.empty((n_chunks,), np.int32)
    blocks = np.zeros((n_chunks, h_chunk, win), Ah.dtype)
    for c in range(n_chunks):
        rows = Ah[c * h_chunk:(c + 1) * h_chunk]
        s = int(np.nonzero(rows.any(axis=0))[0][0])
        s = min(s, hc - win)
        starts[c] = s
        blocks[c] = rows[:, s:s + win]
    starts = jnp.asarray(starts)
    blocks = jnp.asarray(blocks)

    dvals = jnp.arange(d, dtype=jnp.float32)

    def one_chunk(_, sb):
        s, Ahc = sb
        z = jnp.zeros((), s.dtype)
        rows = lax.dynamic_slice(x, (z, z, s, z), (n, d, win, wc))
        hi = jnp.einsum("ih,ndhw->ndiw", Ahc, rows)     # (N, D, h_chunk, Wc)
        full = jnp.einsum("jw,ndiw->ndij", Aw, hi)      # (N, D, h_chunk, W)
        logits = -full if negate else full
        p = jax.nn.softmax(logits, axis=1)
        return None, jnp.einsum("ndij,d->nij", p, dvals)

    _, out = lax.scan(one_chunk, None, (starts, blocks))
    out = jnp.moveaxis(out, 0, 1).reshape(n, h, w)      # (N, H, W)
    return out[..., None]
