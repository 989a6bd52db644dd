from vs_seg_tpu.nn.layers import Conv3d, ConvTranspose3d, BatchNorm, PReLU, Dropout
from vs_seg_tpu.nn.blocks import Convolution, ResidualUnit, AttentionBlock1, attention_gate
