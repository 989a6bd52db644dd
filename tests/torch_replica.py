"""A torch replica of the reference UNet2d5_spvPA, built from the semantics
documented in SURVEY.md §3.3 (reference params/networks/nets/unet2d5_spvPA.py).

Used ONLY in tests as a golden oracle: it produces state_dicts with the exact
naming scheme of reference checkpoints, so the converter + our JAX model can be
validated end-to-end without MONAI or real .pth files.
"""

import numpy as np
import torch
import torch.nn as nn


def same_padding(kernel_size, dilation=1):
    # independent implementation: importing the SUT's same_padding would
    # reproduce any bug of the library under test in the oracle
    import numpy as _np
    k = _np.atleast_1d(kernel_size)
    d = _np.atleast_1d(dilation)
    assert not _np.any((k - 1) * d % 2 == 1), "even-kernel padding ambiguous"
    return tuple(int(p) for p in (k - 1) // 2 * d)



class TConvolution(nn.Sequential):
    def __init__(self, cin, cout, kernel, stride=(1, 1, 1), act="prelu",
                 norm="batch", dropout=None, conv_only=False, is_transposed=False):
        super().__init__()
        pad = same_padding(kernel)
        if is_transposed:
            k, s, p = np.asarray(kernel), np.asarray(stride), np.asarray(pad)
            out_pad = tuple(int(v) for v in (s + 2 * p - (k - 1) - 1))
            conv = nn.ConvTranspose3d(cin, cout, kernel, stride, pad, out_pad)
        else:
            conv = nn.Conv3d(cin, cout, kernel, stride, pad)
        self.add_module("conv", conv)
        if conv_only:
            return
        if norm == "batch":
            self.add_module("norm", nn.BatchNorm3d(cout))
        if dropout:
            self.add_module("dropout", nn.Dropout(dropout))
        if act == "prelu":
            self.add_module("act", nn.PReLU(num_parameters=1, init=0.25))
        elif act == "relu":
            self.add_module("act", nn.ReLU())
        elif act == "sigmoid":
            self.add_module("act", nn.Sigmoid())


class TResidualUnit(nn.Module):
    def __init__(self, cin, cout, kernel, subunits=2, dropout=None,
                 last_conv_only=False):
        super().__init__()
        subunits = max(1, subunits)  # reference convolutions.py:215
        self.conv = nn.Sequential()
        ch = cin
        for su in range(subunits):
            conv_only = last_conv_only and su == subunits - 1
            self.conv.add_module(f"unit{su}", TConvolution(
                ch, cout, kernel, dropout=dropout, conv_only=conv_only))
            ch = cout
        self.residual = (nn.Conv3d(cin, cout, 1, 1, 0)
                         if cin != cout else nn.Identity())

    def forward(self, x):
        return self.conv(x) + self.residual(x)


class TAttentionBlock1(nn.Module):
    def __init__(self, cin, kernel):
        super().__init__()
        self.conv1 = TConvolution(cin, cin // 2, kernel, act="relu", norm=None)
        self.conv2 = TConvolution(cin // 2, 1, kernel, act="sigmoid", norm=None)

    def forward(self, x):
        att = self.conv2(self.conv1(x))
        return att, x


class TAttentionBlock2(nn.Module):
    def __init__(self, cin):
        super().__init__()
        self.cin = cin

    def forward(self, t):
        att, x = t
        return att.repeat([1, self.cin, 1, 1, 1]) * x + x


class TSkipConnection(nn.Module):
    def __init__(self, submodule):
        super().__init__()
        self.submodule = submodule

    def forward(self, x):
        return torch.cat([x, self.submodule(x)], dim=1)


class TorchUNet2d5_spvPA(nn.Module):
    """Reference-recursion torch model; forward returns (logits, att_maps)."""

    def __init__(self, in_channels, out_channels, channels, strides,
                 kernel_sizes, sample_kernel_sizes, num_res_units=2, dropout=0.1,
                 attention=True):
        super().__init__()
        # reference unet2d5_spvPA.py:41 structural assert; the replica also
        # refuses num_res_units < 1: the reference's 0-case branches are
        # latently broken (up layer returns the nn.Identity CLASS without
        # attention, and never reduces channels with it) — a replica that
        # silently built residual units there would be a wrong oracle
        assert len(channels) == len(kernel_sizes) == len(strides) + 1 \
            == len(sample_kernel_sizes) + 1, "inconsistent architecture config"
        if num_res_units < 1:
            raise NotImplementedError(
                "num_res_units < 1 mirrors a latently broken reference branch")
        self.attention = attention
        self.att_maps = []

        def hook(module, inp, outp):
            self.att_maps.append(outp[0])

        def att_layer(cin, kernel):
            a1 = TAttentionBlock1(cin, kernel)
            a1.register_forward_hook(hook)
            return nn.Sequential(a1, TAttentionBlock2(cin))

        def create_block(inc, outc, chans, strs, kernels, sample_kernels, is_top):
            c, s, k, sk = chans[0], strs[0], kernels[0], sample_kernels[0]
            down = TResidualUnit(inc, c, k, num_res_units, dropout)
            downsample = TConvolution(c, c, sk, s, dropout=dropout)
            if len(chans) > 2:
                subblock = create_block(c, chans[1], chans[1:], strs[1:],
                                        kernels[1:], sample_kernels[1:], False)
            else:
                bottom_ru = TResidualUnit(c, chans[1], kernels[1], num_res_units, dropout)
                subblock = (nn.Sequential(att_layer(c, kernels[1]), bottom_ru)
                            if attention else bottom_ru)
            upsample = TConvolution(chans[1], c, sk, s, dropout=dropout,
                                    is_transposed=True)
            sub = nn.Sequential(downsample, subblock, upsample)
            ru = TResidualUnit(2 * c, outc, k, 1, dropout, last_conv_only=is_top)
            up = nn.Sequential(att_layer(2 * c, k), ru) if attention else ru
            return nn.Sequential(down, TSkipConnection(sub), up)

        self.model = create_block(in_channels, out_channels, channels, strides,
                                  kernel_sizes, sample_kernel_sizes, True)

    def forward(self, x):
        self.att_maps = []
        return self.model(x), list(self.att_maps)
