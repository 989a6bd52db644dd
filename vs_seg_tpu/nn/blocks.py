"""Composite NN blocks mirroring the reference block zoo.

  Convolution  -- (Conv|ConvTrans) -> Norm -> (Dropout) -> (Act)
                  (reference params/networks/blocks/convolutions.py:22-156)
  ResidualUnit -- N sequential Convolutions + additive residual (1x1 conv when
                  channels change; reference convolutions.py:159-255)
  AttentionBlock1/2 -- spatial-gating attention producing a single-channel map
                  (reference params/networks/blocks/attentionblock.py:6-47)

All blocks are pure flax modules on NDHWC; `train` switches BatchNorm/Dropout
mode (replacing torch's module-level train()/eval() state).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from vs_seg_tpu.nn.layers import (
    BatchNorm, Conv3d, ConvTranspose3d, Dropout, PReLU, Shape3, _triple,
    lookup_pad64, pad64_scope, stash_pad64,
)


def folded_conv_affine(unit_params, unit_stats):
    """Eval BatchNorm folded into a post-conv affine INCLUDING the conv
    bias: y = conv(x) * scale + shift.  Shared by the fused block
    dispatches (here and models/unet2d5_spvpa.py)."""
    ub = unit_stats["norm"]
    inv = unit_params["norm"]["scale"] * jax.lax.rsqrt(ub["var"] + 1e-5)
    shift = (unit_params["norm"]["bias"] - ub["mean"] * inv
             + unit_params["conv"]["bias"] * inv)
    return inv, shift


def resfold_enabled() -> bool:
    """Gate for the eval 1x1-residual fold at the kd=1 ResidualUnit sites
    (VS_RESFOLD). Default OFF: the r4 bench-path A/B (docs/KERNELS.md r4)
    measured the full window loop 429.9/431.4 ms vs 295.1/287.8 baseline —
    widening unit0's conv to 2F output channels and slicing flips the
    surrounding emitters into worse layouts, the same in-context lesson as
    VS_DOT11 at the same sites. Pure-XLA transform, exactness pinned by
    tests/test_model.py::test_resfold_matches_reference either way;
    VS_RESFOLD=1 re-enables for re-evaluation."""
    import os
    return os.environ.get("VS_RESFOLD", "0") == "1"


def _ru_spatial_halo(local_shape, cin: int, cout: int) -> int:
    """H halo for running the fused encoder block on a LOCAL H shard: the
    rublock chain is 2 convs deep in H (unit0 3x3x3 -> unit1 3x3x3; the 1x1
    residual adds no H context). 0 = extended geometry unsupported."""
    from vs_seg_tpu.ops.halo import spatial_fused_halo
    from vs_seg_tpu.ops.pallas_rublock import can_ru_block
    B, D, Hl, W = local_shape[:4]
    return spatial_fused_halo(
        Hl, 2, lambda hx: can_ru_block((B, D, hx, W), cin, cout))


class Convolution(nn.Module):
    """Conv -> BatchNorm -> Dropout -> Activation, or conv_only."""

    features: int
    kernel_size: Shape3
    strides: Shape3 = (1, 1, 1)
    act: Optional[str] = "prelu"       # "prelu" | "relu" | "sigmoid" | None
    norm: Optional[str] = "batch"      # "batch" | None
    dropout: Optional[float] = None
    conv_only: bool = False
    is_transposed: bool = False
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        from vs_seg_tpu.ops import pallas_conv333

        conv_cls = ConvTranspose3d if self.is_transposed else Conv3d
        conv = conv_cls(self.features, self.kernel_size, _triple(self.strides),
                        dtype=self.dtype, name="conv")
        if self.conv_only:
            return conv(x)
        affine = None
        if self.norm == "batch":
            if train:
                y = BatchNorm(name="norm")(conv(x), train)
            else:
                # frozen BN folds into the conv weights: one fewer full-tensor
                # pass per block at inference, numerically the same affine
                affine = BatchNorm(name="norm", features=self.features)(
                    None, train, fold=True)
                y = conv(x, affine=affine)
        elif self.norm is None:
            y = conv(x)
        else:
            raise ValueError(f"unsupported norm {self.norm}")
        if self.dropout:
            y = Dropout(self.dropout, name="dropout")(y, train)
        if self.act == "prelu":
            y = PReLU(name="act")(y)
        elif self.act == "relu":
            y = jax.nn.relu(y)
        elif self.act == "sigmoid":
            y = jax.nn.sigmoid(y)
        elif self.act is not None:
            raise ValueError(f"unsupported act {self.act}")

        # Fused Pallas path for the (3,3,3) stride-1 conv sites (the net's
        # L2+ levels) at eval on TPU: conv + folded BN (or bias) + PReLU in
        # one pass (ops/pallas_conv333.py; XLA's conv emitter reaches only
        # ~17-21 TFLOP/s at these 48-96-channel shapes).  The XLA chain
        # above stays traced for parameter creation and falls to DCE;
        # numerics pinned by tests/test_pallas_conv333.py and
        # tests/test_model.py.
        fuse333 = self._conv333_fusable(x, train)
        if fuse333 or self._dsconv_fusable(x, train):
            p = self.variables["params"]["conv"]
            w, b = p["kernel"], p["bias"]
            if affine is not None:
                scale, shift = affine[0], b * affine[0] + affine[1]
            else:
                scale, shift = None, b
            if self.act == "prelu":
                alpha = self.variables["params"]["act"]["alpha"]
            elif self.act == "relu":
                alpha = jnp.zeros((1,), jnp.float32)
            else:
                alpha = None
            if fuse333:
                return pallas_conv333.conv333(
                    x, w, scale, shift, alpha,
                    interpret=pallas_conv333.force_interpret())
            # Strided downsample sites between two fused blocks
            # (ops/pallas_dsconv.py, e.g. flagship downsample_2)
            from vs_seg_tpu.ops.experimental import pallas_dsconv
            x_eff = lookup_pad64(x)
            out64 = pallas_dsconv.ds_conv(
                x if x_eff is None else x_eff, w, scale, shift, alpha,
                interpret=pallas_dsconv.force_interpret(), out_padded=True)
            out = out64 if self.features == 64 else out64[..., :self.features]
            stash_pad64(out, out64)
            return out
        return y

    def _conv333_fusable(self, x, train: bool) -> bool:
        from vs_seg_tpu.ops import pallas_conv333

        if (train or self.is_transposed
                or _triple(self.kernel_size) != (3, 3, 3)
                or _triple(self.strides) != (1, 1, 1)
                or self.act not in ("prelu", "relu", None)
                or self.is_initializing()
                or not pallas_conv333.fusion_enabled()):
            return False
        xs = x if isinstance(x, (tuple, list)) else (x,)
        cin = sum(int(v.shape[-1]) for v in xs)
        return pallas_conv333.can_conv333(
            [v.shape for v in xs], (3, 3, 3, cin, self.features))

    def _dsconv_fusable(self, x, train: bool) -> bool:
        from vs_seg_tpu.ops.experimental import pallas_dsconv

        if (train or self.is_transposed or isinstance(x, (tuple, list))
                or _triple(self.kernel_size) != (3, 3, 3)
                or _triple(self.strides) != (2, 2, 2)
                or self.act not in ("prelu", "relu", None)
                or self.is_initializing()
                or not pallas_dsconv.fusion_enabled()):
            return False
        return pallas_dsconv.can_ds_conv(
            x.shape, (3, 3, 3, int(x.shape[-1]), self.features),
            itemsize=jnp.dtype(x.dtype).itemsize)


class ResidualUnit(nn.Module):
    """`subunits` Convolutions + additive residual.

    Residual branch: identity if same channels and stride 1; otherwise a conv
    (1x1x1 kernel when stride==1, reference convolutions.py:241-250).
    `last_conv_only` strips norm/act from the final subunit (logit head).
    """

    features: int
    kernel_size: Shape3
    strides: Shape3 = (1, 1, 1)
    subunits: int = 2
    act: Optional[str] = "prelu"
    norm: Optional[str] = "batch"
    dropout: Optional[float] = None
    last_conv_only: bool = False
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        strides = _triple(self.strides)
        pair = isinstance(x, (tuple, list))
        in_features = (sum(v.shape[-1] for v in x) if pair else x.shape[-1])
        cx = x
        subunits = max(1, self.subunits)
        for su in range(subunits):
            conv_only = self.last_conv_only and su == subunits - 1
            cx = Convolution(
                self.features, self.kernel_size,
                strides if su == 0 else (1, 1, 1),
                act=self.act, norm=self.norm, dropout=self.dropout,
                conv_only=conv_only, dtype=self.dtype, name=f"unit{su}",
            )(cx, train)
        if int(np.prod(strides)) != 1 or in_features != self.features:
            rkernel = self.kernel_size if int(np.prod(strides)) != 1 else (1, 1, 1)
            rpad = None if int(np.prod(strides)) != 1 else (0, 0, 0)
            res = Conv3d(self.features, rkernel, strides, padding=rpad,
                         dtype=self.dtype, name="residual")(x)
            if self._res331_fusable(train, pair, rkernel):
                # The 1x1x1 residual's emitter is pathological at the
                # pair-input decoder sites (up_1/residual: 12.07 ms/volume
                # at 0.8 TF/s, EmitAllBatchInSublanes — r5 cost table)
                # while the SAME-shape (3,3,1) convs there run at
                # ~90-170 TF/s.  Recompute it as a (3,3,1) conv with wr
                # center-embedded in a zero kernel — 9x the (cheap) MACs,
                # but the fast emitter; identical values.  The traced 1x1
                # conv above keeps the parameters and falls to DCE.
                # Exactness: tests/test_model.py::test_res331_matches_
                # reference; VS_RES331 gates the bench A/B.
                res = self._res331_apply(x)
        else:
            assert not pair, "identity residual undefined for pair input"
            res = x
        out = cx + res
        if self._headfold_fusable(train, pair, in_features):
            # Conv-only logit head (up_0: subunits=1 + last_conv_only,
            # reference convolutions.py:218,231): with NO norm/act between,
            # out = conv0(x) + b0 + conv1x1(x) + br is LINEAR in the
            # kernels, so the residual folds EXACTLY into unit0's conv
            # (wr center-embedded, biases summed) with UNCHANGED
            # cin/cout/kernel/strides — no emitter flip surface, unlike
            # VS_RESFOLD's channel widening.  Kills the up_0/residual conv
            # (12.1 ms/volume, 0.8 TF/s) and the add (2.1 ms) outright.
            # Exactness pinned by tests/test_model.py::
            # test_headfold_matches_reference; VS_HEADFOLD=0 restores.
            return self._headfold_apply(x, in_features)
        if self._resfold_fusable(x, train, pair, in_features):
            # 1x1-residual fold (eval, kd=1 levels, VS_RESFOLD=1 only —
            # measured NEGATIVE, docs/KERNELS.md r4): the residual as
            # EXTRA OUTPUT CHANNELS of unit0's conv (wr center-embedded in
            # a zero (3,3,1) kernel); unit1 + the add recomputed from the
            # folded params so the traced chain above falls to DCE.
            # Exactness pinned by
            # tests/test_model.py::test_resfold_matches_reference.
            return self._resfold_apply(x, in_features)
        if self._rublock_fusable(x, train, pair, in_features):
            # Fused encoder-block Pallas path (ops/pallas_rublock.py for
            # (3,3,3), ops/pallas_block2d.py for (3,3,1)): conv0+BN/PReLU
            # -> conv1+BN/PReLU -> 1x1 residual in one kernel.  The traced
            # XLA chain above stays for parameter creation and falls to
            # DCE at inference; numerics pinned by
            # tests/test_model.py::test_fused_rublock_matches_reference.
            out = self._rublock_apply(x, in_features)
        return out

    def _res331_fusable(self, train: bool, pair: bool, rkernel) -> bool:
        import os
        return (not train and pair and _triple(rkernel) == (1, 1, 1)
                and _triple(self.kernel_size) == (3, 3, 1)
                and not self.is_initializing()
                and os.environ.get("VS_RES331", "0") == "1")

    def _res331_apply(self, x):
        from vs_seg_tpu.nn.layers import conv3d, same_padding

        p = self.variables["params"]["residual"]
        wr, br = p["kernel"], p["bias"]
        k = _triple(self.kernel_size)
        wf = jnp.pad(wr, [(k[0] // 2,) * 2, (k[1] // 2,) * 2,
                          (k[2] // 2,) * 2, (0, 0), (0, 0)])
        pads = [(pi, pi) for pi in same_padding(k)]
        one = (1, 1, 1)
        ca = x[0].shape[-1]
        return (conv3d(x[0], wf[..., :ca, :], None, one, pads,
                       dtype=self.dtype)
                + conv3d(x[1], wf[..., ca:, :], br, one, pads,
                         dtype=self.dtype))

    def _headfold_fusable(self, train: bool, pair: bool,
                          in_features: int) -> bool:
        import os
        return (not train and self.last_conv_only and self.subunits == 1
                and int(np.prod(_triple(self.strides))) == 1
                and in_features != self.features
                and not self.is_initializing()
                and os.environ.get("VS_HEADFOLD", "1") == "1")

    def _headfold_apply(self, x, in_features: int):
        from vs_seg_tpu.nn.layers import conv3d, same_padding

        p = self.variables["params"]
        w0 = p["unit0"]["conv"]["kernel"]
        b0 = p["unit0"]["conv"]["bias"]
        wr, br = p["residual"]["kernel"], p["residual"]["bias"]
        k = _triple(self.kernel_size)
        # center-embed via pad (a .at[].add scatter miscomposes with the
        # Manual mesh inside shard_map regions)
        wf = w0 + jnp.pad(wr, [(k[0] // 2,) * 2, (k[1] // 2,) * 2,
                               (k[2] // 2,) * 2, (0, 0), (0, 0)])
        bf = b0 + br
        pads = [(pi, pi) for pi in same_padding(k)]
        one = (1, 1, 1)
        if isinstance(x, (tuple, list)):
            ca = x[0].shape[-1]
            return (conv3d(x[0], wf[..., :ca, :], None, one, pads,
                           dtype=self.dtype)
                    + conv3d(x[1], wf[..., ca:, :], bf, one, pads,
                             dtype=self.dtype))
        return conv3d(x, wf, bf, one, pads, dtype=self.dtype)

    def _resfold_fusable(self, x, train: bool, pair: bool,
                         in_features: int) -> bool:
        if (train or self.subunits != 2 or self.last_conv_only
                or _triple(self.strides) != (1, 1, 1)
                or _triple(self.kernel_size) != (3, 3, 1)
                or self.act != "prelu" or self.norm != "batch"
                or in_features == self.features
                or self.is_initializing()):
            return False
        if self._rublock_fusable(x, train, pair, in_features):
            return False  # the 2D mega-kernel already fuses the residual
        return resfold_enabled()

    def _resfold_apply(self, x, in_features: int):
        from vs_seg_tpu.nn.layers import conv3d, same_padding

        p = self.variables["params"]
        bs = self.variables["batch_stats"]
        inv0, b0 = folded_conv_affine(p["unit0"], bs["unit0"])
        inv1, b1 = folded_conv_affine(p["unit1"], bs["unit1"])
        a0 = p["unit0"]["act"]["alpha"]
        a1 = p["unit1"]["act"]["alpha"]
        w0 = p["unit0"]["conv"]["kernel"] * inv0
        w1 = p["unit1"]["conv"]["kernel"] * inv1
        wr, br = p["residual"]["kernel"], p["residual"]["bias"]
        k = _triple(self.kernel_size)
        f = self.features
        wr_emb = jnp.zeros((*k, in_features, f), w0.dtype)
        wr_emb = wr_emb.at[k[0] // 2, k[1] // 2, k[2] // 2].set(wr[0, 0, 0])
        wcat = jnp.concatenate([w0, wr_emb], axis=-1)
        bcat = jnp.concatenate([b0, br])
        pads = [(pi, pi) for pi in same_padding(k)]
        one = (1, 1, 1)
        if isinstance(x, (tuple, list)):
            ca = x[0].shape[-1]
            ycat = (conv3d(x[0], wcat[..., :ca, :], None, one, pads,
                           dtype=self.dtype)
                    + conv3d(x[1], wcat[..., ca:, :], bcat, one, pads,
                             dtype=self.dtype))
        else:
            ycat = conv3d(x, wcat, bcat, one, pads, dtype=self.dtype)
        y0, r = ycat[..., :f], ycat[..., f:]
        u0 = jnp.maximum(y0, 0) + a0.astype(y0.dtype) * jnp.minimum(y0, 0)
        y1 = conv3d(u0, w1, b1, one, pads, dtype=self.dtype)
        u1 = jnp.maximum(y1, 0) + a1.astype(y1.dtype) * jnp.minimum(y1, 0)
        return u1 + r

    def _rublock_fusable(self, x, train: bool, pair: bool,
                         in_features: int) -> bool:
        from vs_seg_tpu.nn import layers
        from vs_seg_tpu.ops import pallas_rublock
        from vs_seg_tpu.ops.experimental import pallas_block2d

        kern = _triple(self.kernel_size)
        if (train or pair or self.subunits != 2 or self.last_conv_only
                or _triple(self.strides) != (1, 1, 1)
                or kern not in ((3, 3, 3), (3, 3, 1))
                or self.act != "prelu" or self.norm != "batch"
                or in_features == self.features
                or self.is_initializing()):
            return False
        if kern == (3, 3, 3):
            if not pallas_rublock.fusion_enabled():
                return False
            if layers._SPATIAL is not None and layers._SPATIAL[1] > 1:
                return _ru_spatial_halo(x.shape, in_features,
                                        self.features) > 0
            # n_shards == 1: the local block IS the volume — plain dispatch
            return pallas_rublock.can_ru_block(x.shape, in_features,
                                               self.features)
        if layers._SPATIAL is not None:
            return False  # kd=1 2D kernels are not halo-aware (default-off)
        cp = pallas_block2d.pick_cp(in_features, self.features)
        return (pallas_block2d.ru_fusion_enabled()
                and pallas_block2d.can_block2d(x.shape, cp, 1))

    def _rublock_apply(self, x, in_features: int):
        from vs_seg_tpu.ops import pallas_rublock
        from vs_seg_tpu.ops.experimental import pallas_block2d

        p = self.variables["params"]
        bs = self.variables["batch_stats"]

        def folded(unit):
            inv, shift = folded_conv_affine(p[unit], bs[unit])
            return p[unit]["conv"]["kernel"], inv, shift, \
                p[unit]["act"]["alpha"]

        w0, s0, h0, a0 = folded("unit0")
        w1, s1, h1, a1 = folded("unit1")
        kw = dict(w0=w0, bn0_scale=s0, bn0_shift=h0, alpha0=a0,
                  w1=w1, bn1_scale=s1, bn1_shift=h1, alpha1=a1,
                  wr=p["residual"]["kernel"], br=p["residual"]["bias"])
        if _triple(self.kernel_size) == (3, 3, 3):
            from vs_seg_tpu.nn import layers
            if layers._SPATIAL is not None and layers._SPATIAL[1] > 1:
                # Halo-aware spatial dispatch: extend the local H block with
                # real neighbor rows (boundary shards roll-aligned to the
                # kernel's own zero padding), run the unchanged kernel, keep
                # the local rows (ops/halo.py:halo_block_input).
                from vs_seg_tpu.ops.halo import halo_block_input
                axis_name, n_shards = layers._SPATIAL
                h = _ru_spatial_halo(x.shape, in_features, self.features)
                hl = x.shape[2]
                x_ext, start = halo_block_input(x, h, axis_name, 2, n_shards)
                out = pallas_rublock.ru_block(
                    x_ext, interpret=pallas_rublock.FORCE_INTERPRET, **kw)
                return jax.lax.dynamic_slice_in_dim(out, start, hl, axis=2)
            x_eff = lookup_pad64(x)
            out64 = pallas_rublock.ru_block(
                x if x_eff is None else x_eff,
                interpret=pallas_rublock.FORCE_INTERPRET, out_padded=True,
                **kw)
            out = (out64 if self.features == 64
                   else out64[..., :self.features])
            stash_pad64(out, out64)
            return out
        return pallas_block2d.ru_block2d(
            x, cp=pallas_block2d.pick_cp(in_features, self.features),
            interpret=pallas_block2d.FORCE_INTERPRET, **kw)


class AttentionBlock1(nn.Module):
    """conv(C -> C/2, ReLU) -> conv(C/2 -> 1, Sigmoid); returns (att, x) —
    or, with gate=True, (att, att*x + x) applying AttentionBlock2 inline.

    Reference attentionblock.py:6-35 (norm=None, dropout=None inside).
    With gate=True at inference on TPU, the conv2 + sigmoid + gate tail runs
    as one fused Pallas pass (ops/pallas_att.py) when the site's shapes
    allow it — the (..., 1) attention tensor otherwise forces lane-starved
    layouts on every consumer (~45 ms/volume in the round-3 trace).  The
    unfused conv2 is still traced for parameter creation and falls out via
    DCE; numerics are pinned by tests/test_pallas_att.py and
    tests/test_model.py::test_fused_attention_matches_reference.
    """

    kernel_size: Shape3
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False,
                 gate: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
        from vs_seg_tpu.ops.experimental import pallas_att

        pair = isinstance(x, (tuple, list))
        c = (sum(v.shape[-1] for v in x) if pair else x.shape[-1])
        a1 = Convolution(c // 2, self.kernel_size, act="relu", norm=None,
                         dropout=None, dtype=self.dtype, name="conv1")(x, train)
        att = Convolution(1, self.kernel_size, act="sigmoid", norm=None,
                          dropout=None, dtype=self.dtype, name="conv2")(a1, train)
        if not gate:
            return att, x

        xs = tuple(x) if pair else (x,)
        kh, kw, kd = _triple(self.kernel_size)
        if (not train and (kh, kw) == (3, 3)
                and pallas_att.fusion_enabled()
                and pallas_att.can_fuse(a1.shape, [v.shape for v in xs], kd)):
            w2 = self.variables["params"]["conv2"]["conv"]["kernel"]
            b2 = self.variables["params"]["conv2"]["conv"]["bias"]
            att_w, gated = pallas_att.fused_attention_gate(
                a1, xs, w2, b2, kd=kd,
                ht=pallas_att.pick_ht(a1.shape[2]),
                interpret=pallas_att.force_interpret())
            # the XLA `att` above is now dead -> DCE'd; expose the compact map
            return att_w[..., :1], (gated if pair else gated[0])
        import os
        if (not train and len({v.shape[-1] for v in xs}) == 1
                and os.environ.get("VS_WIDE_ATT") == "1"):
            # Opt-in pending proof: the r3 window-scale A/B measured this
            # path 97 vs 80 ms / 2-window batch — the wide conv2 costs more
            # than the lane-starved tail it removes at L0/L1 scale.
            # Wide-conv2 gate: tile the C->1 conv2 weights to C->Cx so the
            # attention map is born replicated over Cx lanes — every
            # consumer (sigmoid, att*x + x) then runs at full lane width.
            # A (..., 1) tensor forces lane-starved layouts on the whole
            # tail: the r3 trace bills those ops ~28 ms of an 83 ms
            # 2-window forward.  Numerically identical (each wide channel
            # is the same dot product); the model's att-map output is a
            # lane slice of the wide map.
            from vs_seg_tpu.nn.layers import conv3d, same_padding

            p = self.variables["params"]["conv2"]["conv"]
            cw = xs[0].shape[-1]
            w2w = jnp.tile(p["kernel"], (1, 1, 1, 1, cw))
            b2w = jnp.broadcast_to(p["bias"].reshape(-1), (cw,))
            pads = [(pi, pi) for pi in same_padding((kh, kw, kd))]
            aw = conv3d(a1, w2w, b2w, (1, 1, 1), pads, dtype=self.dtype)
            att_w = jax.nn.sigmoid(aw)
            gated = tuple(att_w.astype(v.dtype) * v + v for v in xs)
            return att_w[..., :1], (gated if pair else gated[0])
        return att, attention_gate(att, x)


def attention_gate(att: jnp.ndarray, x):
    """AttentionBlock2: out = att*x + x (residual spatial gating,
    reference attentionblock.py:43-47). Parameter-free, so a function.
    Accepts a pair (xa, xb) standing for channel-concat: gates each half."""
    if isinstance(x, (tuple, list)):
        return tuple(att.astype(v.dtype) * v + v for v in x)
    return att * x + x
