"""Shared flax building blocks for the model zoo.

Re-creates the reference's layer builders and weight-init rules
(models/util_conv.py) in NHWC/NDHWC flax:

  * ``conv*``: weights ~ N(0, sqrt(2 / (prod(kernel) * out_ch)))
    (util_conv.py:36-44 ``net_init``), biases ~ torch's fan-in uniform.
  * ``deconv*``: torch ConvTranspose defaults (fan-in uniform), since the
    reference's ``net_init`` isinstance checks never match transposed
    convs (util_conv.py:32-53) and they keep torch's default init.
  * torch deconv geometry p=(k-1)//2, op=s-(k-2p) (util_conv.py:132-137,
    164-169) always yields an exact stride-x upsample; we express it as
    lax.conv_transpose padding pairs (p, k-p-s).
  * BatchNorm: momentum 0.1 (flax 0.9), eps 1e-5, init gamma=1 beta=0.
    Under jit + GSPMD sharding, batch statistics are computed over the
    global (sharded) batch, giving cross-replica sync-BN for free.

Crop-glue helpers mirror models/util_fun.py: concat/add after cropping
all operands to the smallest common spatial extent, absorbing the
off-by-one sizes odd inputs produce.
"""

from __future__ import annotations

import contextlib
import contextvars
import functools
from typing import Callable, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "compute_dtype",
    "default_dtype",
    "ConvBN",
    "FoldedConvBN3d",
    "DeconvBN",
    "ResBlockGC",
    "ResBlockPSM",
    "res_stack_gc",
    "crop_cat",
    "crop_add",
    "conv_kernel_init",
    "torch_fanin_uniform",
]


def conv_kernel_init(key, shape, dtype=jnp.float32):
    """Reference conv init: N(0, sqrt(2/n)), n = prod(kernel)*out_ch
    (util_conv.py:36-44).  flax kernel shape is (*kernel, in, out)."""
    n = float(np.prod(shape[:-2]) * shape[-1])
    return jax.random.normal(key, shape, dtype) * jnp.sqrt(2.0 / n).astype(dtype)


def scaled_conv_kernel_init(scale: float):
    """Conv init scaled by ``scale`` — the reference multiplies its
    disparity-head weights by 0.1 after net_init (dispnet.py:61-62)."""

    def init(key, shape, dtype=jnp.float32):
        return conv_kernel_init(key, shape, dtype) * scale

    return init


def torch_fanin_uniform(key, shape, dtype=jnp.float32):
    """torch-0.3 _ConvNd default: U(-s, s), s = 1/sqrt(in_ch*prod(kernel))."""
    fan_in = float(np.prod(shape[:-2]) * shape[-2])
    s = 1.0 / np.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -s, s)


def _fanin_uniform_bias(fan_in: float):
    s = 1.0 / np.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -s, s)

    return init


def _fanin_uniform_kernel(fan_in: float):
    """torch _ConvNd default with an explicit fan (the flax transpose-kernel
    layout hides which axis is the input channel)."""
    return _fanin_uniform_bias(fan_in)


def _tup(v, n):
    return tuple(v) if isinstance(v, (tuple, list)) else (v,) * n


_compute_dtype = contextvars.ContextVar("dsmnet_compute_dtype", default=None)


@contextlib.contextmanager
def compute_dtype(dtype):
    """Set the computation dtype for all ConvBN/DeconvBN layers traced
    inside the context (e.g. ``jnp.bfloat16`` for MXU throughput).
    Parameters stay float32; flax BatchNorm computes statistics in
    float32 regardless.  Model outputs are cast back to float32 at the
    disparity heads."""
    token = _compute_dtype.set(dtype)
    try:
        yield
    finally:
        _compute_dtype.reset(token)


def default_dtype():
    return _compute_dtype.get()


class LeanBN(nn.Module):
    """BatchNorm with accumulate-dtype statistics and input-dtype math.

    flax's nn.BatchNorm materializes f32 copies of the full activation
    for its backward when the compute dtype is bf16 — the r4 b4 trace
    shows tens of ms/step of f32 volume copies feeding BN gradients.
    This version reduces straight from the input with an f32 accumulator
    (``jnp.mean(..., dtype=f32)`` — no f32 volume intermediate exists in
    the jaxpr, so autodiff saves only the bf16 input and per-channel
    scalars) and normalizes in the input dtype.  Same formula as flax
    (fast variance E[x^2]-E[x]^2, biased running var, full backprop
    through batch statistics) and the same variable structure, so
    checkpoints and param trees are interchangeable.  In f32 it is
    numerically the same computation as nn.BatchNorm."""

    use_running_average: bool
    momentum: float = 0.9
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (C,))
        bias = self.param("bias", nn.initializers.zeros, (C,))
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((C,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((C,), jnp.float32))
        axes = tuple(range(x.ndim - 1))
        acc = jnp.promote_types(x.dtype, jnp.float32)  # f32, or f64 under x64
        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            mean = jnp.mean(x, axes, dtype=acc)
            var = jnp.mean(jnp.square(x), axes, dtype=acc) \
                - jnp.square(mean)
            if not self.is_initializing():
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1 - m) * \
                    jax.lax.stop_gradient(mean)
                ra_var.value = m * ra_var.value + (1 - m) * \
                    jax.lax.stop_gradient(var)
        inv = jax.lax.rsqrt(var + self.epsilon) * scale
        sh = (1,) * (x.ndim - 1) + (C,)
        inv = inv.reshape(sh).astype(x.dtype)
        off = (bias - mean * scale * jax.lax.rsqrt(var + self.epsilon))
        off = off.reshape(sh).astype(x.dtype)
        return x * inv + off


def make_bn(train: bool, name: str = "BatchNorm_0"):
    """LeanBN with the reference's BN hyperparameters (momentum 0.1 in
    torch terms = 0.9 flax-style, eps 1e-5)."""
    return LeanBN(use_running_average=not train, momentum=0.9,
                  epsilon=1e-5, name=name)


class _FastConv3dS2(nn.Module):
    """Drop-in for nn.Conv on k=3 s=2 p=1 3-D convs (hourglass
    down-stages) using ops.conv3d.conv3d_s2 — same parameter structure
    and init; space-to-depth GEMM + per-tap dK on TPU."""

    features: int
    use_bias: bool
    kernel_init: Callable
    bias_init: Callable
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        from ..ops.conv3d import conv3d_s2

        kshape = (3, 3, 3, x.shape[-1], self.features)
        kern = self.param("kernel", self.kernel_init, kshape)
        dt = self.dtype
        if dt is not None:
            x = x.astype(dt)
            kern = kern.astype(dt)
        y = conv3d_s2(x, kern)
        if self.use_bias:
            b = self.param("bias", self.bias_init, (self.features,))
            y = y + (b.astype(dt) if dt is not None else b)
        return y


class _FastConv3d(nn.Module):
    """Drop-in for nn.Conv on eligible 3-D convs (stride 1, SAME,
    undilated) using ops.conv3d.conv3d_same — same parameter structure
    (kernel/bias under this module) and init, ~8x faster kernel-gradient
    on TPU (PERF.md)."""

    features: int
    kernel: tuple
    use_bias: bool
    kernel_init: Callable
    bias_init: Callable
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        from ..ops.conv3d import conv3d_same

        kshape = (*self.kernel, x.shape[-1], self.features)
        kern = self.param("kernel", self.kernel_init, kshape)
        dt = self.dtype
        if dt is not None:
            x = x.astype(dt)
            kern = kern.astype(dt)
        y = conv3d_same(x, kern)
        if self.use_bias:
            b = self.param("bias", self.bias_init, (self.features,))
            y = y + (b.astype(dt) if dt is not None else b)
        return y


class _FastConv2d(nn.Module):
    """Drop-in for nn.Conv on eligible 2-D convs (3x3, stride 1, SAME,
    undilated) using ops.conv2d.conv2d_same — same parameter structure
    and init; routes the feature-tower shapes whose channels fold into
    dense 128-lane rows to the Pallas 2-D kernels on TPU."""

    features: int
    use_bias: bool
    kernel_init: Callable
    bias_init: Callable
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        from ..ops.conv2d import conv2d_same

        kshape = (3, 3, x.shape[-1], self.features)
        kern = self.param("kernel", self.kernel_init, kshape)
        dt = self.dtype
        if dt is not None:
            x = x.astype(dt)
            kern = kern.astype(dt)
        y = conv2d_same(x, kern)
        if self.use_bias:
            b = self.param("bias", self.bias_init, (self.features,))
            y = y + (b.astype(dt) if dt is not None else b)
        return y


class _FastDeconv3d(nn.Module):
    """Drop-in for nn.ConvTranspose on k=3 s=2 3-D deconvs using
    ops.conv3d.deconv3d_k3s2 (parity-folded GEMM on TPU).  Same param
    structure as ConvTranspose(transpose_kernel=True): kernel
    (3,3,3,Cout,Cin), optional bias."""

    features: int
    use_bias: bool
    kernel_init: Callable
    bias_init: Callable
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        from ..ops.conv3d import deconv3d_k3s2

        kshape = (3, 3, 3, self.features, x.shape[-1])
        kern = self.param("kernel", self.kernel_init, kshape)
        dt = self.dtype
        if dt is not None:
            x = x.astype(dt)
            kern = kern.astype(dt)
        y = deconv3d_k3s2(x, kern)
        if self.use_bias:
            b = self.param("bias", self.bias_init, (self.features,))
            y = y + (b.astype(dt) if dt is not None else b)
        return y


class _FastDeconv3dFolded(nn.Module):
    """Drop-in for _FastDeconv3d on the FOLDED volume: same param tree
    (kernel (3,3,3,features,Cin) under this module) but input and output
    stay in the dense-lane folded form (ops/folded.py
    folded_deconv3d_k3s2 — the stride-2 Pallas kernel trio under
    transposition for the 64->32 up-deconvs)."""

    features: int
    Cin: int
    W_in: int
    use_bias: bool
    kernel_init: Callable
    bias_init: Callable
    dtype: object = None

    @nn.compact
    def __call__(self, xf):
        from ..ops.folded import folded_deconv3d_k3s2

        kshape = (3, 3, 3, self.features, self.Cin)
        kern = self.param("kernel", self.kernel_init, kshape)
        dt = self.dtype
        if dt is not None:
            xf = xf.astype(dt)
            kern = kern.astype(dt)
        y = folded_deconv3d_k3s2(xf, kern, self.Cin, self.W_in)
        if self.use_bias:
            b = self.param("bias", self.bias_init, (self.features,))
            r = 128 // self.features if self.features <= 128 else 1
            bl = jnp.tile(b, max(r, 1))[:128] if self.features < 128 \
                else b[:128]
            y = y + (bl.astype(dt) if dt is not None else bl)
        return y


class FoldedDeconvBN3d(nn.Module):
    """DeconvBN(dims=3, k=3, s=2) on the FOLDED volume — identical param
    tree ({name}/ConvTranspose_0/{kernel[,bias]} + {name}/BatchNorm_0)
    but no unfold/fold round-trip (ops/folded.folded_deconv3d_k3s2)."""

    features: int
    Cin: int
    W_in: int
    bn: bool = True
    relu: bool = True
    use_bias: bool = True

    @nn.compact
    def __call__(self, xf, train: bool = True):
        from ..ops.folded import folded_batchnorm_view

        fan_in = 27.0 * self.Cin
        dt = default_dtype()
        y = _FastDeconv3dFolded(
            self.features, self.Cin, self.W_in, self.use_bias,
            _fanin_uniform_kernel(fan_in), _fanin_uniform_bias(fan_in),
            dt, name="ConvTranspose_0",
        )(xf)
        if self.bn:
            v = folded_batchnorm_view(y, self.features)
            v = make_bn(train)(v)
            y = v.reshape(y.shape)
        if self.relu:
            y = nn.relu(y)
        return y


class _FoldedConv3d(nn.Module):
    """Kernel-param holder for the folded-volume convs — same param
    structure (kernel/bias under this module) as _FastConv3d/
    _FastConv3dS2 so folded and unfolded pathways share checkpoints.
    The bias broadcasts over the folded lane groups (r copies)."""

    features: int
    C: int
    W: int
    stride: int
    kernel_init: Callable
    dtype: object = None
    use_bias: bool = False
    bias_init: Callable | None = None

    @nn.compact
    def __call__(self, xf):
        from ..ops.folded import folded_conv3d_s2, folded_conv3d_same

        kshape = (3, 3, 3, self.C, self.features)
        kern = self.param("kernel", self.kernel_init, kshape)
        dt = self.dtype
        if dt is not None:
            xf = xf.astype(dt)
            kern = kern.astype(dt)
        if self.stride == 2:
            y = folded_conv3d_s2(xf, kern, self.C, self.W)
        else:
            y = folded_conv3d_same(xf, kern, self.C, self.W)
        if self.use_bias:
            b = self.param("bias", self.bias_init, (self.features,))
            r = 128 // self.features if self.features <= 128 else 1
            bl = jnp.tile(b, max(r, 1))[:128] if self.features < 128 \
                else b[:128]
            y = y + (bl.astype(dt) if dt is not None else bl)
        return y


class FoldedConvBN3d(nn.Module):
    """convbn_3d on the FOLDED volume (N, D, H, W*C/128, 128) — the
    dense-lane pathway that keeps the 3-D regularizer free of per-conv
    pad/refold/layout traffic (ops/folded.py; r4 trace analysis).
    Param tree matches ConvBN(dims=3, bn=True) exactly:
    {name}/Conv_0/{kernel[,bias]} + {name}/BatchNorm_0/{scale,bias}."""

    features: int
    C: int           # logical input channels
    W: int           # logical input width
    stride: int = 1
    relu: bool = True
    use_bias: bool = False

    @nn.compact
    def __call__(self, xf, train: bool = True):
        from ..ops.folded import folded_batchnorm_view

        dt = default_dtype()
        fan_in = 27.0 * self.C
        xf = _FoldedConv3d(
            self.features, self.C, self.W, self.stride, conv_kernel_init,
            dt, self.use_bias, _fanin_uniform_bias(fan_in), name="Conv_0",
        )(xf)
        v = folded_batchnorm_view(xf, self.features)
        v = make_bn(train)(v)
        xf = v.reshape(xf.shape)
        if self.relu:
            xf = nn.relu(xf)
        return xf


class _FoldedTo1Core(nn.Module):
    """Param holder + call for the folded Cout=1 head (named Conv_0 so
    the param tree matches ConvBN(1, 3, 1, dims=3, use_bias=False))."""

    C: int
    W: int

    @nn.compact
    def __call__(self, xf):
        from ..ops.folded import folded_conv3d_to1

        kern = self.param("kernel", conv_kernel_init, (3, 3, 3, self.C, 1))
        dt = default_dtype()
        if dt is not None:
            xf = xf.astype(dt)
            kern = kern.astype(dt)
        return folded_conv3d_to1(xf, kern, self.C, self.W)


class FoldedConvTo1(nn.Module):
    """PSMNet classifier c1 (32 -> 1 conv, stackhourglass.py:88-98) on
    the FOLDED volume: one lane-dense GEMM whose j-major output reshapes
    freely into the tapfold (W, 27) stack (ops.folded.folded_conv3d_to1)
    — no unfold, no lane-padded read.  Returns the unfolded
    (N, D, H, W, 1) cost map."""

    C: int
    W: int

    @nn.compact
    def __call__(self, xf, train: bool = True):
        del train  # no BN/ReLU on the classifier head
        return _FoldedTo1Core(self.C, self.W, name="Conv_0")(xf)


class ConvBN(nn.Module):
    """Conv (2-D or 3-D by ``dims``) + optional BatchNorm + optional ReLU.

    Mirrors conv2d_bn/conv3d_bn (util_conv.py:116-129,150-162) and
    PSMNet's convbn (psmnet/submodule.py:10-19).  ``padding=None`` uses
    torch's (k-1)//2; pass explicit per-dim pads to replicate quirks like
    PSMNet's padding=dilation.
    """

    features: int
    kernel: int | Sequence[int]
    stride: int | Sequence[int] = 1
    dims: int = 2
    use_bias: bool = True
    bn: bool = False
    relu: bool = True
    dilation: int | Sequence[int] = 1
    padding: int | Sequence[int] | None = None
    kernel_scale: float = 1.0
    dtype: object = None  # computation dtype (bf16 for MXU); params stay f32

    @nn.compact
    def __call__(self, x, train: bool = True):
        k = _tup(self.kernel, self.dims)
        s = _tup(self.stride, self.dims)
        dil = _tup(self.dilation, self.dims)
        if self.padding is None:
            pad = tuple((kk - 1) // 2 for kk in k)
        else:
            pad = _tup(self.padding, self.dims)
        pad_pairs = [(p, p) for p in pad]
        fan_in = float(np.prod(k)) * x.shape[-1]
        kinit = (
            conv_kernel_init
            if self.kernel_scale == 1.0
            else scaled_conv_kernel_init(self.kernel_scale)
        )
        dt = self.dtype if self.dtype is not None else default_dtype()
        fast3d = (
            self.dims == 3
            and all(ss == 1 for ss in s)
            and all(dd == 1 for dd in dil)
            and tuple(pad) == tuple((kk - 1) // 2 for kk in k)
        )
        fast3d_s2 = (
            self.dims == 3
            and k == (3, 3, 3)
            and s == (2, 2, 2)
            and all(dd == 1 for dd in dil)
            and tuple(pad) == (1, 1, 1)
            and all(dim % 2 == 0 for dim in x.shape[1:4])
        )
        fast2d = (
            self.dims == 2
            and k == (3, 3)
            and s == (1, 1)
            and all(dd == 1 for dd in dil)
            and tuple(pad) == (1, 1)
        )
        if fast3d:
            x = _FastConv3d(
                self.features, k, self.use_bias, kinit,
                _fanin_uniform_bias(fan_in), dt, name="Conv_0",
            )(x)
        elif fast2d:
            x = _FastConv2d(
                self.features, self.use_bias, kinit,
                _fanin_uniform_bias(fan_in), dt, name="Conv_0",
            )(x)
        elif fast3d_s2:
            x = _FastConv3dS2(
                self.features, self.use_bias, kinit,
                _fanin_uniform_bias(fan_in), dt, name="Conv_0",
            )(x)
        else:
            x = nn.Conv(
                self.features,
                kernel_size=k,
                strides=s,
                padding=pad_pairs,
                kernel_dilation=dil,
                use_bias=self.use_bias,
                kernel_init=kinit,
                bias_init=_fanin_uniform_bias(fan_in),
                dtype=dt,
                name="Conv_0",
            )(x)
        if self.bn:
            x = make_bn(train)(x)
        if self.relu:
            x = nn.relu(x)
        return x


class DeconvBN(nn.Module):
    """Transposed conv + optional BN + optional ReLU with torch geometry.

    deconv2d_bn/deconv3d_bn (util_conv.py:132-147,164-179): output is an
    exact ``stride``-factor spatial upsample for any input size.
    """

    features: int
    kernel: int | Sequence[int]
    stride: int | Sequence[int] = 2
    dims: int = 2
    use_bias: bool = True
    bn: bool = False
    relu: bool = True
    dtype: object = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        k = _tup(self.kernel, self.dims)
        s = _tup(self.stride, self.dims)
        # torch geometry p=(k-1)//2, op=s-(k-2p) maps to lax.conv_transpose
        # pads (k-1-p, k-1-p+op) — verified numerically against torch
        pad_pairs = []
        for kk, ss in zip(k, s):
            p = (kk - 1) // 2
            op = ss - (kk - 2 * p)
            pad_pairs.append((kk - 1 - p, kk - 1 - p + op))
        fan_in = float(np.prod(k)) * x.shape[-1]
        dt = self.dtype if self.dtype is not None else default_dtype()
        if self.dims == 3 and k == (3, 3, 3) and s == (2, 2, 2):
            # torch geometry for k3/s2 is pads (1,2) — exactly what
            # deconv3d_k3s2 implements (parity-folded GEMM on TPU)
            x = _FastDeconv3d(
                self.features, self.use_bias, _fanin_uniform_kernel(fan_in),
                _fanin_uniform_bias(fan_in), dt, name="ConvTranspose_0",
            )(x)
        else:
            x = nn.ConvTranspose(
                self.features,
                kernel_size=k,
                strides=s,
                padding=pad_pairs,
                use_bias=self.use_bias,
                transpose_kernel=True,
                kernel_init=_fanin_uniform_kernel(fan_in),
                bias_init=_fanin_uniform_bias(fan_in),
                dtype=dt,
                name="ConvTranspose_0",
            )(x)
        if self.bn:
            x = make_bn(train)(x)
        if self.relu:
            x = nn.relu(x)
        return x


class ResBlockGC(nn.Module):
    """GCNet-family residual BasicBlock (util_conv.py:181-210): two 3x3
    conv+BN (no bias), ReLU after the first and after the residual add."""

    planes: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = True):
        residual = x
        y = ConvBN(self.planes, 3, self.stride, use_bias=False, bn=True, relu=True)(x, train)
        y = ConvBN(self.planes, 3, 1, use_bias=False, bn=True, relu=False)(y, train)
        if self.stride != 1 or x.shape[-1] != self.planes:
            residual = ConvBN(
                self.planes, 1, self.stride, use_bias=False, bn=True, relu=False
            )(x, train)
        return nn.relu(y + residual)


class ResBlockPSM(nn.Module):
    """PSMNet BasicBlock (psmnet/submodule.py:21-43): convbn+relu then
    convbn, residual add, *no* final ReLU; padding follows the
    reference's padding=dilation convention."""

    planes: int
    stride: int = 1
    dilation: int = 1

    @nn.compact
    def __call__(self, x, train: bool = True):
        residual = x
        y = ConvBN(
            self.planes, 3, self.stride, use_bias=False, bn=True, relu=True,
            dilation=self.dilation, padding=self.dilation,
        )(x, train)
        y = ConvBN(
            self.planes, 3, 1, use_bias=False, bn=True, relu=False,
            dilation=self.dilation, padding=self.dilation,
        )(y, train)
        if self.stride != 1 or x.shape[-1] != self.planes:
            residual = ConvBN(
                self.planes, 1, self.stride, use_bias=False, bn=True, relu=False
            )(x, train)
        return y + residual


class res_stack_gc(nn.Module):
    """Stack of GCNet residual blocks (util_conv.py:250-269 conv_res)."""

    planes: int
    blocks: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = ResBlockGC(self.planes, self.stride)(x, train)
        for _ in range(1, self.blocks):
            x = ResBlockGC(self.planes, 1)(x, train)
        return x


def siamese(tower, imL, imR, train: bool = True):
    """Run a weight-shared feature tower over both views as ONE
    batch-2N apply instead of two sequential calls (the reference runs
    e.g. feature_extraction(left) then (right),
    psmnet/stackhourglass.py:119-120).  Halves the XLA op count — one
    conv and one kernel-gradient per layer instead of two — which
    matters because the tower's weight gradients are a large share of
    the train step (PERF.md round 3).  For BN towers the batch
    statistics pool over both views (cross-view sync-BN): a deliberate
    deviation from the reference's per-call stats, strictly more
    samples per statistic."""
    n = imL.shape[0]
    f = tower(jnp.concatenate([imL, imR], axis=0), train)
    return f[:n], f[n:]


def crop_cat(*xs):
    """Crop NHWC/NDHWC operands to the min common spatial size, concat on
    channels (util_fun.py:7-27 myCat2d/myCat3d)."""
    nd = xs[0].ndim
    mins = [min(x.shape[a] for x in xs) for a in range(1, nd - 1)]
    out = []
    for x in xs:
        sl = (slice(None),) + tuple(slice(0, m) for m in mins) + (slice(None),)
        out.append(x[sl])
    return jnp.concatenate(out, axis=-1)


def crop_add(a, b):
    """Crop two operands to min common spatial size and add
    (util_fun.py:30-51 myAdd2d/myAdd3d)."""
    nd = a.ndim
    mins = [min(a.shape[i], b.shape[i]) for i in range(1, nd - 1)]
    sla = (slice(None),) + tuple(slice(0, m) for m in mins) + (slice(None),)
    return a[sla] + b[sla]
