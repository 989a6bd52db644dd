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
)


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
        conv_cls = ConvTranspose3d if self.is_transposed else Conv3d
        conv = conv_cls(self.features, self.kernel_size, _triple(self.strides),
                        dtype=self.dtype, name="conv")
        if self.conv_only:
            return conv(x)
        if self.norm == "batch":
            if train:
                x = BatchNorm(name="norm")(conv(x), train)
            else:
                # frozen BN folds into the conv weights: one fewer full-tensor
                # pass per block at inference, numerically the same affine
                affine = BatchNorm(name="norm", features=self.features)(
                    None, train, fold=True)
                x = conv(x, affine=affine)
        elif self.norm is None:
            x = conv(x)
        else:
            raise ValueError(f"unsupported norm {self.norm}")
        if self.dropout:
            x = Dropout(self.dropout, name="dropout")(x, train)
        if self.act == "prelu":
            x = PReLU(name="act")(x)
        elif self.act == "relu":
            x = jax.nn.relu(x)
        elif self.act == "sigmoid":
            x = jax.nn.sigmoid(x)
        elif self.act is not None:
            raise ValueError(f"unsupported act {self.act}")
        return x


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
        else:
            assert not pair, "identity residual undefined for pair input"
            res = x
        return cx + res


class AttentionBlock1(nn.Module):
    """conv(C -> C/2, ReLU) -> conv(C/2 -> 1, Sigmoid); returns (att, x).

    Reference attentionblock.py:6-35 (norm=None, dropout=None inside).
    """

    kernel_size: Shape3
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
        c = (sum(v.shape[-1] for v in x) if isinstance(x, (tuple, list))
             else x.shape[-1])
        att = Convolution(c // 2, self.kernel_size, act="relu", norm=None,
                          dropout=None, dtype=self.dtype, name="conv1")(x, train)
        att = Convolution(1, self.kernel_size, act="sigmoid", norm=None,
                          dropout=None, dtype=self.dtype, name="conv2")(att, train)
        return att, x


def attention_gate(att: jnp.ndarray, x):
    """AttentionBlock2: out = att*x + x (residual spatial gating,
    reference attentionblock.py:43-47). Parameter-free, so a function.
    Accepts a pair (xa, xb) standing for channel-concat: gates each half."""
    if isinstance(x, (tuple, list)):
        return tuple(att.astype(v.dtype) * v + v for v in x)
    return att * x + x
