"""Global op-implementation switches (benchmarking / debugging).

``use_pallas = None`` (default) auto-selects: Pallas kernels on TPU
backends, jnp reference elsewhere.  Set True/False to force either
path globally — used by benchmarks to compare kernel implementations
inside full models, and as an escape hatch if a Mosaic compile breaks
on a new runtime.
"""

from __future__ import annotations

import jax

use_pallas: bool | None = None


def pallas_enabled(override: bool | None = None) -> bool:
    if override is not None:
        return override
    if use_pallas is not None:
        return use_pallas
    return jax.default_backend() == "tpu"
