"""vs_seg_tpu — a TPU-native (JAX/XLA/Pallas) framework for vestibular schwannoma
segmentation with the full capabilities of the reference KCL-BMEIS/VS_Seg pipeline.

Layer map (mirrors reference layers, re-designed TPU-first):
  core/        config dataclasses, results layout, logging, PRNG utilities
  parallel/    device mesh + sharding rules (ICI data/spatial parallelism)
  data/        NIFTI IO (pure numpy), MONAI-0.4-semantics transforms, cached loader
  nn/          conv / residual / attention building blocks (flax.linen, NDHWC)
  models/      UNet2d5_spvPA and variants (pure functional: (logits, att_maps))
  losses/      hardness-weighted Dice + supervised-attention pyramid loss
  train/       jitted train step (Adam + coupled L2), loop, checkpointing
  infer/       batched sliding-window inference with Gaussian blending
  eval/        Dice metric, figures
  ops/         Pallas TPU kernels for the hot paths
  compat/      reference .pth checkpoint import
  preprocessing/  DICOM -> NIFTI toolchain (no 3D Slicer dependency)
"""

__version__ = "0.1.0"

# Persistent XLA compilation cache: compiles on this platform go through a
# remote compile service with minutes-scale latency, so caching across
# processes is load-bearing for iteration speed.
import os as _os

import jax as _jax

_cache_dir = _os.environ.get("VS_SEG_JAX_CACHE", "/root/.cache/jax_vs_seg")
try:
    _jax.config.update("jax_compilation_cache_dir", _cache_dir)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass
