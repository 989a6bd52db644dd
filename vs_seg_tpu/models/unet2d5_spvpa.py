"""UNet2d5_spvPA — 6-level 2.5D residual U-Net with deep spatial-attention
supervision, as a pure functional flax module.

Topology matches the reference recursion exactly
(params/networks/nets/unet2d5_spvPA.py:56-93, model config
params/VSparams.py:343-374):

  level i = 0..4 (channels c_i, stride s_i, kernel k_i, sample kernel sk_i):
    down_i      ResidualUnit(c_{i-1} -> c_i, stride 1, `num_res_units` subunits)
    downsample_i Convolution(c_i -> c_i, stride s_i, kernel sk_i)
    ... recurse ...
    upsample_i  ConvTranspose Convolution(c_{i+1} -> c_i, stride s_i, kernel sk_i)
    concat([down_i_out, upsampled], channel)          # SkipConnection order
    upatt_i     AttentionBlock1(2*c_i) + gate         # if attention
    up_i        ResidualUnit(2*c_i -> outc_i, 1 subunit,
                             last_conv_only at top)   # outc_0 = out_channels
  bottom: AttentionBlock1(c_4) + gate, ResidualUnit(c_4 -> c_5)

The reference collects attention maps statefully via forward hooks
(unet2d5_spvPA.py:101-104); here they are returned functionally, ordered
coarsest -> finest exactly like the hook firing order (bottom att fires first,
then decoder attentions bottom-up).

Returns (logits, att_maps): logits (B, H, W, D, out_channels);
att_maps[k] each (B, h_k, w_k, d_k, 1).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from vs_seg_tpu.nn.blocks import AttentionBlock1, Convolution, ResidualUnit
from vs_seg_tpu.nn.layers import Shape3


class UNet2d5_spvPA(nn.Module):
    out_channels: int = 2
    channels: Sequence[int] = (16, 32, 48, 64, 80, 96)
    strides: Sequence[Shape3] = ((2, 2, 1), (2, 2, 1), (2, 2, 2), (2, 2, 2), (2, 2, 2))
    kernel_sizes: Sequence[Shape3] = (
        (3, 3, 1), (3, 3, 1), (3, 3, 3), (3, 3, 3), (3, 3, 3), (3, 3, 3))
    sample_kernel_sizes: Sequence[Shape3] = (
        (3, 3, 1), (3, 3, 1), (3, 3, 3), (3, 3, 3), (3, 3, 3))
    num_res_units: int = 2
    dropout: Optional[float] = 0.1
    attention_module: bool = True
    dtype: jnp.dtype = jnp.bfloat16
    # rematerialize block activations in the backward pass (jax.checkpoint).
    # Measured on v5e (16 GB): full-volume bf16 training fits WITHOUT remat
    # through batch 2, and remat costs ~47 ms/step (454 -> 407 ms at batch 1,
    # runs/trace_r2) — so it defaults OFF; enable for larger local batches.
    remat: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        from vs_seg_tpu.nn.layers import pad64_scope, train_conv_scope
        if train:
            with train_conv_scope(), pad64_scope():
                return self._forward(x, train)
        with pad64_scope():
            return self._forward(x, train)

    def _forward(self, x, train: bool):
        assert len(self.channels) == len(self.kernel_sizes) \
            == len(self.strides) + 1 == len(self.sample_kernel_sizes) + 1
        if self.num_res_units < 1:
            # the reference's num_res_units=0 branches are latently broken
            # (unet2d5_spvPA.py:195-200 returns the nn.Identity CLASS in the
            # no-attention case, and the attention case never reduces
            # channels) — refuse loudly rather than diverge silently
            raise NotImplementedError(
                "num_res_units < 1 mirrors a latently broken reference branch")
        n = len(self.strides)  # number of down/up levels (5)
        common = dict(norm="batch", dropout=self.dropout, dtype=self.dtype)
        # Selective rematerialization: only the top levels hold large
        # activations (L0 at 384x384x64 is ~300 MB/buffer); deeper levels keep
        # their residuals to avoid recompute cost.
        remat_levels = 2

        def blocks(level):
            if self.remat and train and level < remat_levels:
                return (nn.remat(ResidualUnit, static_argnums=(2,)),
                        nn.remat(Convolution, static_argnums=(2,)))
            return ResidualUnit, Convolution

        att_maps = []

        # --- encoder ---
        skips = []
        for i in range(n):
            ResidualUnit_, Convolution_ = blocks(i)
            x = ResidualUnit_(self.channels[i], self.kernel_sizes[i],
                              subunits=self.num_res_units,
                              name=f"down_{i}", **common)(x, train)
            skips.append(x)
            x = Convolution_(self.channels[i], self.sample_kernel_sizes[i],
                             self.strides[i], name=f"downsample_{i}", **common)(x, train)

        # --- bottom (reference _get_bottom_layer, unet2d5_spvPA.py:152-158) ---
        if self.attention_module:
            att, x = AttentionBlock1(self.kernel_sizes[n], dtype=self.dtype,
                                     name="bottom_att")(x, train, gate=True)
            att_maps.append(att)
        x = ResidualUnit(self.channels[n], self.kernel_sizes[n],
                         subunits=self.num_res_units, name="bottom", **common)(x, train)

        # --- decoder ---
        for i in reversed(range(n)):
            ResidualUnit_, Convolution_ = blocks(i)
            x = Convolution_(self.channels[i], self.sample_kernel_sizes[i],
                             self.strides[i], is_transposed=True,
                             name=f"upsample_{i}", **common)(x, train)
            # SkipConnection concat, held as a PAIR: every consumer splits its
            # conv over the halves (exact; avoids the materialized concat and
            # its layout-transpose copies — nn/layers.Conv3d pair path)
            x = (skips[i], x.astype(skips[i].dtype))
            pair_in = x
            if self.attention_module:
                att, x = AttentionBlock1(self.kernel_sizes[i], dtype=self.dtype,
                                         name=f"upatt_{i}")(x, train, gate=True)
                att_maps.append(att)
            outc = self.out_channels if i == 0 else self.channels[i]
            x = ResidualUnit_(outc, self.kernel_sizes[i], subunits=1,
                              last_conv_only=(i == 0), name=f"up_{i}", **common)(x, train)
            if self._l2block_fusable(pair_in, i, outc, train,
                                     ResidualUnit_ is ResidualUnit):
                # Fused decoder-block Pallas path (ops/pallas_l2block.py
                # for (3,3,3) levels, ops/pallas_block2d.py for (3,3,1)):
                # the whole att-conv1 -> conv2+sigmoid -> gate -> unit0 ->
                # residual chain in one kernel.  The traced XLA chain above
                # stays for parameter creation / the att map and falls to
                # DCE at inference; numerics pinned by
                # tests/test_model.py::test_fused_l2block_matches_reference.
                x = self._l2block_apply(pair_in, i, outc)

        return x, tuple(att_maps)

    def _l2block_fusable(self, pair_in, i: int, outc: int, train: bool,
                         own_blocks: bool) -> bool:
        from vs_seg_tpu.nn.layers import _triple

        if (train or not self.attention_module or not own_blocks
                or self.is_initializing()):
            return False
        return l2block_fusable(_triple(self.kernel_sizes[i]), pair_in, i, outc)

    def _l2block_apply(self, pair_in, i: int, outc: int):
        from vs_seg_tpu.nn.layers import _triple
        return l2block_apply(self.variables, _triple(self.kernel_sizes[i]),
                             pair_in, i, outc)


def l2block_fusable(kern, pair_in, i: int, outc: int) -> bool:
    """Fused decoder-block shape/gate check — shared by the model __call__
    and the spatially-sharded forward (infer/spatial.py)."""
    from vs_seg_tpu.nn import layers
    from vs_seg_tpu.ops import pallas_l2block
    from vs_seg_tpu.ops.experimental import pallas_block2d

    if kern not in ((3, 3, 3), (3, 3, 1)):
        return False
    xa, xb = pair_in
    c = int(xa.shape[-1])
    if int(xb.shape[-1]) != c or tuple(xb.shape) != tuple(xa.shape):
        return False
    if kern == (3, 3, 3):
        if i == 0 or outc != c or not pallas_l2block.fusion_enabled():
            return False
        if layers._SPATIAL is not None and layers._SPATIAL[1] > 1:
            return _l2_spatial_halo(xa.shape, c) > 0
        # n_shards == 1: the local block IS the volume — plain dispatch
        return pallas_l2block.can_l2_block(xa.shape, c)
    if layers._SPATIAL is not None:
        return False  # kd=1 2D kernels are not halo-aware (default-off)
    if _tail2d_route(pair_in, i, outc):
        return True
    cp = pallas_block2d.pick_cp(c, outc)
    return (pallas_block2d.l2_fusion_enabled()
            and pallas_block2d.can_block2d(xa.shape, cp, 2))


def _tail2d_route(pair_in, i: int, outc: int) -> bool:
    """Fused kd=1 decoder TAIL (ops/pallas_tail2d.py): att conv1 stays on
    XLA (measured 87 TF/s there, r5 cost table); conv2 + gate + unit0 +
    residual fuse.  Mutually exclusive with the full block2d kernel."""
    from vs_seg_tpu.ops.experimental import pallas_tail2d

    c = int(pair_in[0].shape[-1])
    return (pallas_tail2d.fusion_enabled(i)
            and pallas_tail2d.can_tail2d(pair_in[0].shape, c, c, outc))


def _l2_spatial_halo(local_shape, c: int) -> int:
    """H halo for the fused decoder block on a LOCAL H shard: the l2block
    chain is 3 convs deep in H (att conv1 -> conv2 -> unit0, each 3x3x3; the
    1x1 residual adds no H context). 0 = extended geometry unsupported."""
    from vs_seg_tpu.ops.halo import spatial_fused_halo
    from vs_seg_tpu.ops.pallas_l2block import can_l2_block
    B, D, Hl, W = local_shape[:4]
    return spatial_fused_halo(
        Hl, 3, lambda hx: can_l2_block((B, D, hx, W), c))


def l2block_apply(variables, kern, pair_in, i: int, outc: int):
    """Dispatch the fused decoder block (att conv1 -> conv2+sigmoid -> gate
    -> unit0+BN/PReLU -> 1x1 residual) for level `i`. Under spatial sharding
    the local H blocks are extended with exchanged halo rows and the exact
    center is kept (ops/halo.py:spatial_fused_halo)."""
    from vs_seg_tpu.nn import layers
    from vs_seg_tpu.ops import pallas_l2block
    from vs_seg_tpu.ops.experimental import pallas_block2d

    p = variables["params"]
    att_p = p[f"upatt_{i}"]
    ru_p = p[f"up_{i}"]
    if i == 0:
        # conv-only logit head: degenerate epilogue (scale 1, shift =
        # bias, identity activation)
        inv, shift, alpha = None, ru_p["unit0"]["conv"]["bias"], None
    else:
        from vs_seg_tpu.nn.blocks import folded_conv_affine
        inv, shift = folded_conv_affine(
            ru_p["unit0"], variables["batch_stats"][f"up_{i}"]["unit0"])
        alpha = ru_p["unit0"]["act"]["alpha"]
    kw = dict(
        w1=att_p["conv1"]["conv"]["kernel"],
        b1=att_p["conv1"]["conv"]["bias"],
        w2=att_p["conv2"]["conv"]["kernel"],
        b2=att_p["conv2"]["conv"]["bias"],
        w0=ru_p["unit0"]["conv"]["kernel"], bn_scale=inv, bn_shift=shift,
        alpha=alpha,
        wr=ru_p["residual"]["kernel"], br=ru_p["residual"]["bias"])
    if kern == (3, 3, 3):
        if layers._SPATIAL is not None and layers._SPATIAL[1] > 1:
            import jax

            from vs_seg_tpu.ops.halo import halo_block_input
            axis_name, n_shards = layers._SPATIAL
            h = _l2_spatial_halo(pair_in[0].shape, int(pair_in[0].shape[-1]))
            hl = pair_in[0].shape[2]
            (xa, start), (xb, _) = (halo_block_input(v, h, axis_name, 2,
                                                     n_shards)
                                    for v in pair_in)
            out = pallas_l2block.l2_block(
                xa, xb, interpret=pallas_l2block.FORCE_INTERPRET, **kw)
            return jax.lax.dynamic_slice_in_dim(out, start, hl, axis=2)
        from vs_seg_tpu.nn.layers import lookup_pad64, stash_pad64
        c = int(pair_in[0].shape[-1])
        xa, xb = (lookup_pad64(v) if lookup_pad64(v) is not None else v
                  for v in pair_in)
        out64 = pallas_l2block.l2_block(
            xa, xb, interpret=pallas_l2block.FORCE_INTERPRET,
            out_padded=True, **kw)
        out = out64 if c == 64 else out64[..., :c]
        stash_pad64(out, out64)
        return out
    c = int(pair_in[0].shape[-1])
    if _tail2d_route(pair_in, i, outc):
        import jax

        from vs_seg_tpu.nn.layers import conv3d, same_padding
        from vs_seg_tpu.ops.experimental import pallas_tail2d

        # att conv1 on XLA, exactly as the traced Convolution pair path
        # (Conv3d splits the concat; act=relu, norm=None)
        pads = [(p, p) for p in same_padding((3, 3, 1))]
        dt = pair_in[0].dtype
        ya = conv3d(pair_in[0], kw["w1"][..., :c, :], None, (1, 1, 1), pads,
                    dtype=dt)
        yb = conv3d(pair_in[1], kw["w1"][..., c:, :], kw["b1"], (1, 1, 1),
                    pads, dtype=dt)
        a1 = jax.nn.relu(ya + yb)
        return pallas_tail2d.tail_block(
            a1, pair_in[0], pair_in[1], w2=kw["w2"], b2=kw["b2"],
            w0=kw["w0"], bn_scale=kw["bn_scale"], bn_shift=kw["bn_shift"],
            alpha=kw["alpha"], wr=kw["wr"], br=kw["br"], cout=outc,
            cp=pallas_tail2d.pick_cp(c, c, outc),
            interpret=pallas_tail2d.FORCE_INTERPRET)
    return pallas_block2d.l2_block2d(
        pair_in[0], pair_in[1], cp=pallas_block2d.pick_cp(c, outc),
        interpret=pallas_block2d.FORCE_INTERPRET, **kw)
