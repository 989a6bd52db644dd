"""Low-level NN primitives (channels-last NDHWC, TPU-native).

Semantics match the reference building blocks exactly so that imported
reference checkpoints reproduce outputs:
  - conv / transpose-conv padding arithmetic: reference
    params/networks/blocks/convolutions.py:85,114-135 (MONAI same_padding +
    output_padding = strides + 2*padding - dilation*(kernel-1) - 1, giving
    output = input * stride for the transpose path)
  - BatchNorm: torch BatchNorm3d semantics (biased batch stats for
    normalization, unbiased for the running-var update, momentum 0.1, eps 1e-5)
  - PReLU: single shared parameter, init 0.25 (MONAI Act.PRELU default)
  - Dropout: elementwise, train-only, inverted scaling

Layout (TPU-first): activations (B, D, H, W, C) — depth adjacent to batch.
This makes every "2.5D" conv (kernel depth 1, stride depth 1 — levels 0-1 of
the reference net) a free-reshape 2D convolution over (B*D, H, W, C), which
XLA's TPU conv emitter runs ~4x faster than the equivalent 3D conv at
384x384x64 (measured on v5e); full (3,3,3) convs run as 3D convs with
(D,H,W) spatial order at identical speed to the (H,W,D) order.

Public API convention: kernel sizes/strides are given in reference (H, W, D)
order and conv kernels are stored (kh, kw, kd, Cin, Cout) — reordering to the
internal (D, H, W) spatial order happens inside `conv3d` (a trace-time weight
transpose, fused by XLA). Activations stay in `dtype` (bfloat16 by default)
end-to-end; BatchNorm statistics are computed in float32.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Shape3 = Tuple[int, int, int]

_DN3 = ("NDHWC", "DHWIO", "NDHWC")
_DN2 = ("NHWC", "HWIO", "NHWC")

# When set to a list (see eval/flops.py), conv3d appends its analytic FLOP
# count (2 * out_elems * kh*kw*kd * Cin) at trace time — drives the bench's
# achieved-TFLOP/s / MFU report.
_FLOP_TRACE: Optional[list] = None

# Spatial-sharding context (infer/spatial.py): when set to (axis_name, n)
# inside a shard_map region, conv3d sees LOCAL H blocks and exchanges conv
# halos with jax.lax.ppermute instead of zero-padding H (SURVEY §5: sharding
# one window/volume across the mesh — the reference's "long context" analog,
# counterpart of the tiling at params/VSparams.py:568-574).
_SPATIAL: Optional[Tuple[str, int]] = None


# --- Channel-pad elision between adjacent fused kernels (r4) ---------------
#
# The mega-kernels (ops/pallas_rublock.py, ops/pallas_l2block.py,
# ops/pallas_dsconv.py) work on channels padded to 64 lanes: each one PADS
# its input (C -> 64, a full-tensor copy) and SLICES its output (64 -> C,
# another copy). When two fused kernels are adjacent in the flagship
# (rublock down_2 -> [downsample] -> rublock down_3 -> ... -> l2block), the
# slice/pad round trip between them is pure HBM traffic (~1.7 ms per copy
# at the L2 384x384x64-window scale, r4 trace). The stash below lets a
# fused producer publish its pre-slice padded-64 tensor and an adjacent
# consumer (fused kernel, or an XLA conv whose weight Cin rows we zero-pad
# — algebraically exact) pick it up, so XLA DCEs the slice and no pad is
# ever materialized.
#
# Scope rules: active only inside a `pad64_scope()` (opened per model
# __call__ trace, so entries never outlive their trace); lookups validate
# object identity, so id() recycling cannot alias; everything degrades to
# the plain pad/slice path when the scope is absent (e.g. spatial_forward)
# or the producer wasn't fused.

_PAD64_STACK: list = []


class pad64_scope:
    def __enter__(self):
        _PAD64_STACK.append({})
        return self

    def __exit__(self, *exc):
        _PAD64_STACK.pop()
        return False


def stash_pad64(sliced, padded) -> None:
    """Publish `padded` (64-lane channels) as the pre-slice form of `sliced`."""
    if _PAD64_STACK and sliced is not padded:
        _PAD64_STACK[-1][id(sliced)] = (sliced, padded)


def lookup_pad64(t):
    """The padded-64 sibling of `t`, or None."""
    if _PAD64_STACK:
        hit = _PAD64_STACK[-1].get(id(t))
        if hit is not None and hit[0] is t:
            return hit[1]
    return None


# Train-mode conv-backward context: opened by the model's train forward so
# conv3d routes eligible (3,3,3) stride-1 sites through the custom_vjp with
# the Pallas banded backward (ops/pallas_train.py, VS_TRAINCONV-gated).
_TRAIN_CONV = False


class train_conv_scope:
    def __enter__(self):
        global _TRAIN_CONV
        self._prev, _TRAIN_CONV = _TRAIN_CONV, True

    def __exit__(self, *exc):
        global _TRAIN_CONV
        _TRAIN_CONV = self._prev
        return False


class spatial_sharding:
    """Context manager enabling halo-exchange convs (trace-time toggle)."""

    def __init__(self, axis_name: str, n_shards: int):
        self.ctx = (axis_name, int(n_shards))

    def __enter__(self):
        global _SPATIAL
        self._prev, _SPATIAL = _SPATIAL, self.ctx

    def __exit__(self, *exc):
        global _SPATIAL
        _SPATIAL = self._prev


def _triple(v) -> Shape3:
    if isinstance(v, (tuple, list)):
        assert len(v) == 3
        return tuple(int(x) for x in v)
    return (int(v),) * 3


def same_padding(kernel_size, dilation=1) -> Shape3:
    """MONAI same_padding: (k - 1) // 2 * d per dim (odd kernels exact)."""
    k = np.asarray(_triple(kernel_size))
    d = np.asarray(_triple(dilation))
    return tuple(int(p) for p in (k - 1) // 2 * d)


def _d2c_enabled() -> bool:
    import os
    return os.environ.get("VS_D2C", "0") == "1"


def _dot11_enabled() -> bool:
    import os
    return os.environ.get("VS_DOT11", "0") == "1"


def conv3d(x: jnp.ndarray, w: jnp.ndarray, b: Optional[jnp.ndarray],
           strides: Shape3, padding: Sequence[Tuple[int, int]],
           dtype=jnp.bfloat16, lhs_dilation: Optional[Shape3] = None) -> jnp.ndarray:
    """Convolution on (B, D, H, W, C) activations.

    `strides`/`padding`/`lhs_dilation` and the kernel `w` (kh,kw,kd,I,O) are
    given in reference (H, W, D) order. Depth-trivial convs (kd == 1 and unit
    depth stride/dilation) are folded to 2D over (B*D, H, W, C) — a free
    reshape since D is adjacent to batch.
    """
    precision = (jax.lax.Precision.HIGHEST if dtype == jnp.float32 else None)
    x = x.astype(dtype)
    w = w.astype(dtype)
    B, D = x.shape[0], x.shape[1]
    kh, kw, kd = w.shape[0], w.shape[1], w.shape[2]
    sh, sw, sd = strides
    ph, pw, pd = padding
    ld = lhs_dilation or (1, 1, 1)
    if _SPATIAL is not None:
        # x is a LOCAL H block inside a shard_map region: replace H zero
        # padding with a neighbor halo exchange (exact vs the dense conv —
        # tests/test_spatial.py).
        from vs_seg_tpu.ops.halo import exchange_halo
        axis_name, n_shards = _SPATIAL
        if ld[0] == 1:
            halo = (int(ph[0]), max(kh - int(ph[0]) - sh, 0))
            ph = (0, 0)
        else:
            # transpose conv in H (lhs-dilated): with MONAI's output_padding
            # (output = input*stride, convolutions.py:114-135) the padding is
            # lo = kh-1-p, hi = s+p-1. Per shard: output block [a, a+hl*s)
            # (a = shard_idx*hl*s) reads global dilated positions
            # [a-lo, a+hl*s-1+p]; real (non-dilation-zero) rows at multiples
            # of s give halos (lo//s, ceil(p/s)), and local re-padding
            # (lo%s, p-1+s*(1-ceil(p/s))) realigns the dilated block so
            # local output row o is exactly global row a+o. Exact vs dense:
            # tests/test_spatial.py::test_spatial_transpose_conv_matches_dense.
            s_h = int(ld[0])
            lo = int(ph[0])
            p_h = kh - 1 - lo
            assert p_h >= 0 and int(ph[1]) == s_h + p_h - 1, (
                "spatial sharding supports MONAI transpose-conv arithmetic "
                f"only (output = input*stride); got kh={kh} ld={s_h} ph={ph}")
            halo_r = -(-p_h // s_h)
            halo = (lo // s_h, halo_r)
            ph = (lo % s_h, p_h - 1 + s_h * (1 - halo_r))
        x = exchange_halo(x, halo, axis_name, spatial_axis=2,
                          n_shards=n_shards)
    if (_TRAIN_CONV and _SPATIAL is None and (kh, kw, kd) == (3, 3, 3)
            and (sh, sw, sd) == (1, 1, 1) and lhs_dilation is None
            and tuple(ph) == (1, 1) and tuple(pw) == (1, 1)
            and tuple(pd) == (1, 1)):
        # Train-mode backward fusion: same XLA forward, Pallas banded
        # dx/dw/db (ops/pallas_train.py) — covers the L2/L3 (3,3,3) conv
        # sites (incl. decoder pair halves via Conv3d's split)
        from vs_seg_tpu.ops.experimental import pallas_train
        if (pallas_train.fusion_enabled()
                and pallas_train.can_train_conv(x.shape, w.shape)):
            y = pallas_train.conv333_train(
                x, w,
                jnp.zeros((w.shape[-1],), jnp.float32) if b is None else b,
                dtype=dtype, interpret=pallas_train.FORCE_INTERPRET)
            if _FLOP_TRACE is not None:
                _FLOP_TRACE.append(
                    2 * int(np.prod(y.shape)) * int(np.prod(w.shape[:4])))
            return y
    if ((kh, kw, kd) == (1, 1, 1) and (sh, sw, sd) == (1, 1, 1)
            and lhs_dilation is None
            and tuple(ph) == tuple(pw) == tuple(pd) == (0, 0)
            and _dot11_enabled()):
        # 1x1x1 stride-1 conv as a direct channel contraction. Default OFF:
        # the r4 bench-path A/B measured the full window loop 374.4 ms vs
        # 292.2 with the conv emitter (docs/KERNELS.md r4) — the dot_general
        # forces a C-contracting layout on its operand that the surrounding
        # conv-emitter layouts must transpose into, costing far more than
        # the residual conv's ~6 TF/s inefficiency. VS_DOT11=1 re-enables.
        y = jax.lax.dot_general(x, w[0, 0, 0], (((4,), (0,)), ((), ())),
                                precision=precision)
    elif kd == 1 and sd == 1 and ld[2] == 1 and tuple(pd) == (0, 0):
        y = jax.lax.conv_general_dilated(
            x.reshape(B * D, *x.shape[2:]), w[:, :, 0],
            window_strides=(sh, sw), padding=[ph, pw],
            lhs_dilation=None if lhs_dilation is None else ld[:2],
            dimension_numbers=_DN2, precision=precision)
        y = y.reshape(B, D, *y.shape[1:])
    elif (kd == 3 and tuple(pd) == (1, 1) and lhs_dilation is None
          and _SPATIAL is None and _d2c_enabled()):
        # depth-in-channels: a (3,3,3) conv as ONE folded-2D conv whose
        # input stacks the d-1/d/d+1 planes along C (kd*Cin input
        # channels).  K triples (432 -> 1296 at the 48ch level), which
        # moves the conv into the emitter's high-efficiency regime, and —
        # unlike XLA's 3D path (EmitAllBatchInSublanes) — keeps every
        # level in the same folded-2D layout family, eliminating the 6D
        # space-to-batch relayout copies (~1.4 GB/2-window forward in the
        # r3 trace).  Exact: channel index dd*Cin+c matches the
        # (kh,kw,kd,Cin,Cout) -> (kh,kw,kd*Cin,Cout) weight reshape.
        C = x.shape[-1]
        zeros = ((0, 0),)
        x_m = jnp.pad(x, zeros + ((1, 0),) + zeros * 3)[:, :D]
        x_p = jnp.pad(x, zeros + ((0, 1),) + zeros * 3)[:, 1:]
        xcat = jnp.concatenate([x_m, x, x_p], axis=-1)
        if sd != 1:
            xcat = xcat[:, ::sd]
        Dc = xcat.shape[1]
        y = jax.lax.conv_general_dilated(
            xcat.reshape(B * Dc, *xcat.shape[2:]),
            w.reshape(w.shape[0], w.shape[1], 3 * C, w.shape[4]),
            window_strides=(sh, sw), padding=[ph, pw],
            dimension_numbers=_DN2, precision=precision)
        y = y.reshape(B, Dc, *y.shape[1:])
    else:
        y = jax.lax.conv_general_dilated(
            x, jnp.transpose(w, (2, 0, 1, 3, 4)),
            window_strides=(sd, sh, sw), padding=[pd, ph, pw],
            lhs_dilation=None if lhs_dilation is None else (ld[2], ld[0], ld[1]),
            dimension_numbers=_DN3, precision=precision)
    if b is not None:
        y = y + b.astype(y.dtype)
    if _FLOP_TRACE is not None:
        _FLOP_TRACE.append(2 * int(np.prod(y.shape)) * int(np.prod(w.shape[:4])))
    return y


def _elide_pad(x, w):
    """Swap `x` for its stashed padded-64 sibling (if a fused producer
    published one) and zero-pad the weight's Cin rows to match — conv(x64,
    w0pad) == conv(x, w), and the producer's 64->C slice becomes dead code.
    Weight padding is trace-time (the tensors are tiny); no-op without a
    stash hit."""
    p64 = lookup_pad64(x)
    if p64 is None:
        return x, w
    cin = w.shape[-2]
    return p64, jnp.pad(w, ((0, 0),) * 3 + ((0, p64.shape[-1] - cin), (0, 0)))


class Conv3d(nn.Module):
    """Plain 3D convolution with torch-Conv3d-compatible init and padding.

    `x` may be a PAIR (xa, xb) of tensors standing for their channel concat:
    the conv is computed as conv(xa, w[..., :ca, :]) + conv(xb, w[..., ca:, :])
    — algebraically identical to conv(concat), with the SAME parameter tensor,
    but without materializing the concatenated activation (XLA otherwise
    inserts ~4 ms layout-transpose copies per decoder level at reference
    scale; see runs/trace_r2 and docs/KERNELS.md)."""

    features: int
    kernel_size: Shape3
    strides: Shape3 = (1, 1, 1)
    padding: Optional[Shape3] = None  # None -> same_padding
    use_bias: bool = True
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, affine=None):
        k = _triple(self.kernel_size)
        s = _triple(self.strides)
        p = same_padding(k) if self.padding is None else _triple(self.padding)
        pair = isinstance(x, (tuple, list))
        cin = (sum(v.shape[-1] for v in x) if pair else x.shape[-1])
        # torch Conv3d default init: U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for both
        # kernel (kaiming_uniform with a=sqrt(5)) and bias.
        fan_in = cin * int(np.prod(k))
        bound = 1.0 / np.sqrt(fan_in)

        def uniform_init(key, shape, dtype=jnp.float32):
            return jax.random.uniform(key, shape, dtype, -bound, bound)

        w = self.param("kernel", uniform_init, (*k, cin, self.features), jnp.float32)
        b = (self.param("bias", uniform_init, (self.features,), jnp.float32)
             if self.use_bias else None)
        if affine is not None:
            # fold a frozen per-out-channel affine (e.g. eval BatchNorm) into
            # the weights, in f32: conv(x, w)*inv + shift == conv(x, w*inv)
            # + (b*inv + shift)
            inv, shift = affine
            w = w * inv
            b = shift if b is None else b * inv + shift
        pads = [(pi, pi) for pi in p]
        if pair:
            ca = x[0].shape[-1]
            xa, wa = _elide_pad(x[0], w[..., :ca, :])
            xb, wb = _elide_pad(x[1], w[..., ca:, :])
            ya = conv3d(xa, wa, None, s, pads, dtype=self.dtype)
            yb = conv3d(xb, wb, b, s, pads, dtype=self.dtype)
            return ya + yb
        x, w = _elide_pad(x, w)
        return conv3d(x, w, b, s, pads, dtype=self.dtype)


class ConvTranspose3d(nn.Module):
    """Transpose conv with exact torch-ConvTranspose3d output arithmetic.

    With MONAI's output_padding choice (reference convolutions.py:114-135) the
    output shape is exactly input*stride. Implemented as an input-dilated conv
    with spatially flipped kernels (the adjoint of the strided conv), which XLA
    lowers to the MXU directly.
    """

    features: int
    kernel_size: Shape3
    strides: Shape3 = (1, 1, 1)
    use_bias: bool = True
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, affine=None):
        k = np.asarray(_triple(self.kernel_size))
        s = np.asarray(_triple(self.strides))
        p = np.asarray(same_padding(tuple(k)))
        output_padding = s + 2 * p - (k - 1) - 1
        # dilated-input conv padding: (k-1-p) low, (k-1-p+output_padding) high
        pad = [(int(ki - 1 - pi), int(ki - 1 - pi + opi))
               for ki, pi, opi in zip(k, p, output_padding)]
        cin = x.shape[-1]
        # torch ConvTranspose3d init: fan_in = Cout * prod(k) (weight shape (Cin,Cout,k..))
        fan_in = self.features * int(np.prod(k))
        bound = 1.0 / np.sqrt(fan_in)

        def kernel_init(key, shape, dtype=jnp.float32):
            return jax.random.uniform(key, shape, dtype, -bound, bound)

        w = self.param("kernel", kernel_init, (*[int(v) for v in k], cin, self.features),
                       jnp.float32)
        b = (self.param("bias", kernel_init, (self.features,), jnp.float32)
             if self.use_bias else None)
        if affine is not None:
            inv, shift = affine
            w = w * inv
            b = shift if b is None else b * inv + shift
        w_flipped = jnp.flip(w, axis=(0, 1, 2))
        x, w_flipped = _elide_pad(x, w_flipped)
        return conv3d(x, w_flipped, b, (1, 1, 1), pad, dtype=self.dtype,
                      lhs_dilation=tuple(int(v) for v in s))


class BatchNorm(nn.Module):
    """torch BatchNorm3d semantics over NDHWC (normalize with biased batch
    stats; running var updated with the unbiased estimate).

    `fold=True` (eval only) returns the equivalent per-channel affine
    (inv, shift) instead of applying it, so the caller can fold the frozen
    normalization into the preceding conv's weights — one fewer full-tensor
    pass per Convolution block at inference (`features` supplies the channel
    count since no activation is seen)."""

    momentum: float = 0.1
    eps: float = 1e-5
    features: Optional[int] = None

    @nn.compact
    def __call__(self, x, train: bool, fold: bool = False):
        c = self.features if x is None else x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((c,), jnp.float32))
        if fold:
            assert not train, "BN folding is an eval-only transformation"
            inv = jax.lax.rsqrt(ra_var.value + self.eps) * scale
            return inv, bias - ra_mean.value * inv
        x_dtype = x.dtype
        if train:
            axes = tuple(range(x.ndim - 1))
            xf = x.astype(jnp.float32)
            mean = jnp.mean(xf, axes)
            var = jnp.mean(jnp.square(xf), axes) - jnp.square(mean)
            if not self.is_initializing():
                n = float(np.prod([x.shape[a] for a in axes]))
                unbiased = var * (n / max(n - 1.0, 1.0))
                m = self.momentum
                ra_mean.value = (1 - m) * ra_mean.value + m * mean
                ra_var.value = (1 - m) * ra_var.value + m * unbiased
        else:
            mean, var = ra_mean.value, ra_var.value
        inv = jax.lax.rsqrt(var + self.eps) * scale
        if x_dtype == jnp.float32:
            return (x - mean) * inv + bias
        # low-precision activations: fold into a single scale/shift applied
        # in the activation dtype (stats/params stay f32)
        shift = bias - mean * inv
        return x * inv.astype(x_dtype) + shift.astype(x_dtype)


class PReLU(nn.Module):
    """Single shared slope (torch PReLU num_parameters=1, init 0.25 — the
    MONAI Act.PRELU default used at reference convolutions.py:96)."""

    @nn.compact
    def __call__(self, x):
        a = self.param("alpha", nn.initializers.constant(0.25), (1,), jnp.float32)
        return jnp.maximum(x, 0) + a.astype(x.dtype) * jnp.minimum(x, 0)


ACTIVATIONS = {
    "prelu": None,  # handled as a module (has a parameter)
    "relu": jax.nn.relu,
    "sigmoid": jax.nn.sigmoid,
    None: None,
}


class Dropout(nn.Module):
    """Inverted dropout (torch semantics). The Bernoulli mask is drawn by
    thresholding one u16 random word per element instead of a f32 uniform —
    half the generated bits, ~3 ms cheaper per reference-scale call
    (runs/trace_r2). Keep probability is quantized to 1/65536 (6e-7 absolute
    for the reference rate 0.1); the inverted scale uses the exact quantized
    keep, so E[dropout(x)] == x holds exactly."""

    rate: float

    @nn.compact
    def __call__(self, x, train: bool):
        if not train or self.rate == 0.0:
            return x
        thresh = int(round((1.0 - self.rate) * 65536.0))
        if thresh >= 65536:  # rate below representable: identity
            return x
        keep = thresh / 65536.0
        rng = self.make_rng("dropout")
        mask = jax.random.bits(rng, x.shape, jnp.uint16) < jnp.uint16(thresh)
        return jnp.where(mask, x / keep, 0.0)
