"""Explicit halo-exchange convolution over a spatially-sharded mesh axis.

The framework's default spatial parallelism annotates shardings and
lets XLA GSPMD insert conv halo exchanges (parallel/context.py).  This
module is the explicit counterpart — ``shard_map`` + ``lax.ppermute``
neighbor exchange over ICI — for cases where manual scheduling matters
(fusing the exchange with other collectives, or pipelining it behind
compute) and as the self-contained reference for how the halo pattern
works (SURVEY §2.6).

Only the H axis is sharded; zero padding at the global image border is
reproduced by zeroing the halos of the first/last shard.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

__all__ = ["halo_conv2d"]


def halo_conv2d(x, kernel, mesh: Mesh, axis_name: str = "model"):
    """SAME-padded NHWC 2-D convolution with x sharded over H on
    ``axis_name``.  kernel (kh, kw, Cin, Cout) with odd kh/kw; stride 1.

    Equivalent to ``lax.conv_general_dilated(x, kernel, SAME)`` on the
    unsharded array.
    """
    kh, kw = kernel.shape[0], kernel.shape[1]
    assert kh % 2 == 1 and kw % 2 == 1
    ph, pw = kh // 2, kw // 2
    size = mesh.shape[axis_name]

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(None, axis_name, None, None), P(None, None, None, None)),
        out_specs=P(None, axis_name, None, None),
    )
    def f(xl, k):
        idx = lax.axis_index(axis_name)
        if size > 1 and ph > 0:
            # receive the neighbor rows adjacent to this shard
            up = [(i, (i + 1) % size) for i in range(size)]    # i -> i+1
            down = [(i, (i - 1) % size) for i in range(size)]  # i -> i-1
            top_halo = lax.ppermute(xl[:, -ph:], axis_name, up)
            bot_halo = lax.ppermute(xl[:, :ph], axis_name, down)
            top_halo = jnp.where(idx == 0, 0.0, top_halo)
            bot_halo = jnp.where(idx == size - 1, 0.0, bot_halo)
            xl = jnp.concatenate([top_halo, xl, bot_halo], axis=1)
        elif ph > 0:
            xl = jnp.pad(xl, ((0, 0), (ph, ph), (0, 0), (0, 0)))
        dn = lax.conv_dimension_numbers(xl.shape, k.shape, ("NHWC", "HWIO", "NHWC"))
        return lax.conv_general_dilated(
            xl, k, (1, 1), [(0, 0), (pw, pw)], dimension_numbers=dn
        )

    return f(x, kernel)
