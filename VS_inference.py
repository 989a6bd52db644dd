#!/usr/bin/env python3
"""Inference entry point — CLI-compatible with the reference VS_inference.py.

Flow (reference VS_inference.py:15-42): parse args -> logger -> split CSV ->
test transforms -> cached test loader -> model -> load best checkpoint ->
sliding-window inference + Dice + NIFTI export + figures.

Accepts our full-state .ckpt checkpoints or reference .pth state_dicts
(auto-converted via vs_seg_tpu.compat.torch_import).
"""

# Honor an explicit JAX_PLATFORMS env var. The container's sitecustomize
# force-registers a remote TPU backend and OVERRIDES the env var via
# jax.config (register() sets jax_platforms="axon,cpu"); restoring the env
# value here lets `JAX_PLATFORMS=cpu python VS_*.py` actually run on CPU
# (e.g. with XLA_FLAGS=--xla_force_host_platform_device_count=N for
# multi-chip smoke runs without hardware).
import os as _os

if _os.environ.get("JAX_PLATFORMS"):
    import jax as _jax

    try:
        _jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])
    except RuntimeError:
        pass  # backend already initialized (e.g. library use)

import argparse
import os

from vs_seg_tpu.core import (add_reference_cli_flags, config_from_args,
                             create_results_folders, log_parameters,
                             set_up_logger)
from vs_seg_tpu.data.dataset import CacheDataset, DataLoader, load_split_csv
from vs_seg_tpu.data.transforms import get_transforms
from vs_seg_tpu.infer import run_inference
from vs_seg_tpu.models import build_model


def load_model_state(cfg, model):
    """best_metric_model.ckpt (ours) or best_metric_model.pth (reference).

    The loaded parameter tree is validated against `model`'s expected
    structure/shapes — a checkpoint from a different architecture config
    fails loudly here instead of at trace time deep inside the first step."""
    ckpt_path = os.path.join(cfg.model_path, "best_metric_model.ckpt")
    pth_path = os.path.join(cfg.model_path, "best_metric_model.pth")
    if os.path.exists(ckpt_path):
        from vs_seg_tpu.train.checkpoint import load_checkpoint
        state = load_checkpoint(ckpt_path)
        params, stats = state["params"], state["batch_stats"]
    elif os.path.exists(pth_path):
        from vs_seg_tpu.compat.torch_import import import_unet2d5_spvpa, load_pth
        params, stats = import_unet2d5_spvpa(
            load_pth(pth_path), channels=tuple(cfg.channels),
            num_res_units=cfg.num_res_units, attention=cfg.attention)
    else:
        raise FileNotFoundError(f"no checkpoint under {cfg.model_path}")

    import jax
    from vs_seg_tpu.train.trainer import init_model, minimal_input_shape
    expect = jax.eval_shape(
        lambda: init_model(model, 0, input_shape=minimal_input_shape(model)))
    got_shapes = jax.tree_util.tree_map(lambda a: tuple(a.shape), params)
    want_shapes = jax.tree_util.tree_map(lambda a: tuple(a.shape),
                                         expect["params"])
    if got_shapes != want_shapes:
        raise ValueError(
            "checkpoint parameter tree does not match the configured model "
            f"architecture (cfg: channels={cfg.channels}, "
            f"attention={cfg.attention})")
    return params, stats


def main(argv=None):
    parser = argparse.ArgumentParser()
    add_reference_cli_flags(parser)
    cfg = config_from_args(parser.parse_args(argv))

    create_results_folders(cfg)
    logger = set_up_logger(cfg, "test_log.txt")
    log_parameters(cfg, logger)

    _, _, test_files = load_split_csv(cfg.split_csv, cfg.dataset, cfg.data_root)
    logger.info("Number of images in test set = %d", len(test_files))
    _, _, test_t = get_transforms(cfg.pad_crop_shape_test)
    logger.info("Caching test data set...")
    test_ds = CacheDataset(test_files, test_t, num_workers=cfg.num_workers)
    test_loader = DataLoader(test_ds, batch_size=1)

    model = build_model(cfg)
    params, batch_stats = load_model_state(cfg, model)
    dice_scores, times = run_inference(cfg, model, params, batch_stats,
                                       test_loader, logger=logger)
    return dice_scores, times


if __name__ == "__main__":
    main()
