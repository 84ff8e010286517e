"""Honest device timing through high-latency / deeply-pipelined runtimes.

On remote-executor TPU attachments (and to a lesser degree any async
PJRT backend), ``block_until_ready`` can return before the device has
actually finished, and per-dispatch round-trip latency (10s of ms)
drowns out kernel time.  The only reliable clock is:

  1. build a *serial dependency chain* of N applications of the op
     inside one jit (each iteration consumes a scalar derived from the
     previous output, so nothing can be elided or reordered), and
  2. force completion with a device->host fetch of the final scalar,
  3. difference two chain lengths to cancel dispatch + fetch overhead:

     t_op = (T(n_big) - T(n_small)) / (n_big - n_small)

Calibration on this attachment: a 4096^3 f32 matmul measures ~0.94 ms
(~147 TFLOP/s — physical for v5e), where naive block_until_ready loops
report absurdities like 47 PFLOP/s.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["time_op", "time_pytree_step"]


def _fetch(x):
    return float(jax.device_get(x))


def time_op(fn, *args, n_small: int = 1, n_big: int = 11, reps: int = 3) -> float:
    """Seconds per application of ``fn(*args) -> array``.

    The first argument must be an array; a vanishing perturbation
    (carry * 1e-30) threads the serial dependency through it.  The chain
    length is a *traced* loop bound so both lengths share one compile
    (remote compilation of a big graph can take minutes).
    """

    @jax.jit
    def run(n, *a):
        def body(_, carry):
            first = a[0] + carry.astype(a[0].dtype)
            out = fn(first, *a[1:])
            return jnp.mean(out).astype(jnp.float32) * 1e-30

        return lax.fori_loop(0, n, body, jnp.float32(0.0))

    _fetch(run(n_small, *args))
    _fetch(run(n_big, *args))

    def best(n):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            _fetch(run(n, *args))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    t1, t2 = best(n_small), best(n_big)
    return max((t2 - t1) / (n_big - n_small), 1e-9)


def time_pytree_step(step_fn, carry, *args, n_small: int = 1, n_big: int = 6,
                     reps: int = 3) -> float:
    """Seconds per application of ``step_fn(carry, *args) -> carry`` where
    carry is a pytree (e.g. a TrainState): the chain is the natural state
    dependency."""

    @jax.jit
    def run(n, c, *a):
        def body(_, c):
            return step_fn(c, *a)

        c = lax.fori_loop(0, n, body, c)
        return jnp.sum(jax.flatten_util.ravel_pytree(c)[0][:16])

    _fetch(run(n_small, carry, *args))
    _fetch(run(n_big, carry, *args))

    def best(n):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            _fetch(run(n, carry, *args))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    t1, t2 = best(n_small), best(n_big)
    return max((t2 - t1) / (n_big - n_small), 1e-9)
