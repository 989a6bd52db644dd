from vs_seg_tpu.ops.pallas_blend import pallas_blend_scatter
from vs_seg_tpu.ops.grouped_conv import grouped_conv2d, build_block_toeplitz
