from vs_seg_tpu.models.unet2d5_spvpa import UNet2d5_spvPA
from vs_seg_tpu.models.unet2d5 import UNet2d5
from vs_seg_tpu.models.unet import UNet


def build_model(cfg):
    """Model factory (reference params/VSparams.py:337-379)."""
    import jax.numpy as jnp
    dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    if cfg.model == "UNet2d5_spvPA":
        return UNet2d5_spvPA(
            out_channels=cfg.out_channels, channels=tuple(cfg.channels),
            strides=tuple(cfg.strides), kernel_sizes=tuple(cfg.kernel_sizes),
            sample_kernel_sizes=tuple(cfg.sample_kernel_sizes),
            num_res_units=cfg.num_res_units, dropout=cfg.dropout,
            attention_module=cfg.attention, dtype=dtype,
            remat=getattr(cfg, "remat", False),
        )
    raise Exception("Model not defined.")
