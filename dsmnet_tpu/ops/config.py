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

# 3-D conv formulation for stride-1 SAME convs (ops/conv3d.py):
#   "native"  — lax conv (GEMM lane fill = Cout/128; ~16 TFLOP/s bf16 at
#               PSMNet volume shapes)
#   "kwfold"  — kw taps folded into Cout in XLA (measured slower: the
#               (kd,kh,1)-kernel lowering erases the fill win)
#   "pallas"  — folded-lane Pallas kernel (ops/conv3d_pallas.py): kwfold
#               N + 9-tap-deep K GEMM per w-parity, ring-DMA slabs;
#               1.8x native at the 32->32 full-volume shape (PERF.md r3)
#   None      — auto: pallas on TPU (with per-shape native fallback),
#               native elsewhere
conv3d_impl: str | None = None

# transposed-conv formulation for k=3 s=2 deconvs (ops/conv3d.py):
#   "native"  — lax.conv_transpose
#   "parity"  — all 8 output parities folded into one dense (2,2,2) conv
#   None      — auto: parity on TPU backends, native elsewhere
deconv3d_impl: str | None = None


# kernel-gradient formulation for stride-1 SAME 3x3x3 convs
# (ops/conv3d.py _bwd):
#   "pertap"  — 27 deep einsums with (Ci,Co) output tiles
#   "stacked" — one GEMM, (kd,kh) taps on M / kw taps on N.  2.1x faster
#               in a dK-only microbench (scripts/bench_dk.py) but 2x
#               SLOWER whenever dx is computed alongside (the 509 MB
#               shifted-stack materialization wrecks XLA scheduling;
#               scripts/bench_dk AB run, PERF.md) — kept for benchmarks
#   "pallas"  — folded-lane Pallas kernel (one (9C, 3Co)-tile GEMM per
#               w-parity, VMEM-resident accumulator; conv3d_pallas.py)
#   None      — auto: pallas on TPU (per-shape pertap fallback),
#               pertap elsewhere
conv3d_dk: str | None = None


def conv3d_dk_mode() -> str:
    if conv3d_dk is not None:
        return conv3d_dk
    return "pallas" if jax.default_backend() == "tpu" else "pertap"


# stride-2 3x3x3 conv formulation (ops/conv3d.py conv3d_s2):
#   "native" — lax strided conv (XLA lowering ~9 TFLOP/s at conv1 shape)
#   "s2d"    — space-to-depth + dense (2,2,2) conv (2.37x FLOPs, deep
#              full-tile GEMM); measured SLOWER than native forward
#              (1.85 vs 1.42 ms at conv1 shape) — the fill win does not
#              cover the FLOP blowup.  The custom VJP still computes dK
#              on the s2d view in either mode (2.73 -> 2.53 ms full
#              grad), so only the forward formulation toggles here.
#   "pallas" — folded-parity Pallas kernel pair (conv3d_s2_pallas.py):
#              fwd 0.145 ms vs 1.3 native at the conv1 shape (custom-
#              call time, r4 trace); dx runs through the parity-folded
#              deconv GEMM and dK through the transpose contraction of
#              the same patch matrix.  Per-shape native fallback.
#   None     — auto: pallas on TPU, native elsewhere
conv3d_s2: str | None = None


def conv3d_s2_mode() -> str:
    if conv3d_s2 is not None:
        return conv3d_s2
    return "pallas" if jax.default_backend() == "tpu" else "native"


# Fused-stem jnp assembly formulation (ops/fused_costvol.py):
#   "skew"    — gather-free: right groups collapse to ONE skew-reshape
#               broadcast, left is a fused prefix-map select, boundaries
#               are where-fused (r5; removes the r4 trace's ~23 ms of
#               gather fusions + ~14 ms of concat copies at b4)
#   "grouped" — r4 diagonal-grouped assembly (5 right-group gathers +
#               boundary concats); kept for A/B benchmarking
stem_assembly: str = "skew"

# Folded-volume regularizer pathway (ops/folded.py): keep the 3-D
# cost volume in the dense-lane (N,D,H,W*C/128,128) form between convs.
#   True/False — force; None — auto: on for TPU backends.
folded_regularizer: bool | None = None


def folded_enabled() -> bool:
    if folded_regularizer is not None:
        return folded_regularizer
    return jax.default_backend() == "tpu"


def pallas_enabled(override: bool | None = None) -> bool:
    if override is not None:
        return override
    if use_pallas is not None:
        return use_pallas
    return jax.default_backend() == "tpu"


def conv3d_mode() -> str:
    if conv3d_impl is not None:
        return conv3d_impl
    return "pallas" if jax.default_backend() == "tpu" else "native"


def deconv3d_mode() -> str:
    if deconv3d_impl is not None:
        return deconv3d_impl
    return "parity" if jax.default_backend() == "tpu" else "native"
