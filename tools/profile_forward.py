#!/usr/bin/env python3
"""Per-level timing of the flagship forward + train step at reference scale
(384x384x64 window). In-graph scan chains; scalar-readback sync.

Usage: python tools/profile_forward.py [forward|levels|train|trace]
`trace` additionally captures a jax.profiler trace into runs/trace_r2/.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

REPS = 3


def sync(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def timeit(fn, *args, n=1):
    out = fn(*args)
    sync(out if not isinstance(out, tuple) else out[0])
    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        out = fn(*args)
        sync(out if not isinstance(out, tuple) else out[0])
        best = min(best, time.perf_counter() - t0)
    return best / n


def profile_forward():
    from vs_seg_tpu.models.unet2d5_spvpa import UNet2d5_spvPA
    from vs_seg_tpu.train.trainer import init_model
    model = UNet2d5_spvPA(dtype=jnp.bfloat16)
    variables = init_model(model, 0)
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(1, 64, 384, 384, 1)), jnp.bfloat16)

    @jax.jit
    def fwd(x):
        return model.apply(variables, x, train=False)[0]

    dt = timeit(fwd, x)
    from vs_seg_tpu.eval.flops import forward_conv_flops
    fl = forward_conv_flops(model, variables, (1, 64, 384, 384, 1))
    print(f"forward 384x384x64: {dt*1e3:.1f} ms  ({fl/dt/1e12:.1f} TFLOP/s, "
          f"{fl/1e12:.2f} TFLOP)")

    @jax.jit
    def fwd2(x):
        return model.apply(variables, x, train=False)[0]

    x2 = jnp.concatenate([x, x], 0)
    dt2 = timeit(fwd2, x2)
    print(f"forward batch-2:    {dt2*1e3:.1f} ms")
    sys.stdout.flush()


def _chain_timed(fn, x, n=8):
    """Time fn(x) via an in-graph scan chain (dispatch-latency free). The
    carry perturbs the input each iteration so XLA cannot hoist the body."""

    def step(acc, _):
        y = fn(x + acc.astype(x.dtype))
        return jnp.max(jnp.abs(y)).astype(jnp.float32) * 1e-12, ()

    @jax.jit
    def run(x):
        acc, _ = jax.lax.scan(step, jnp.float32(0.0), None, length=n)
        return acc[None]

    sync(run(x))
    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        sync(run(x))
        best = min(best, time.perf_counter() - t0)
    return best / n


def profile_levels():
    """Each level's (down ResUnit + downsample) and (upsample + att + up) at
    its native scale, batch 1."""
    from vs_seg_tpu.nn.blocks import AttentionBlock1, Convolution, ResidualUnit
    cfg_ch = (16, 32, 48, 64, 80, 96)
    strides = ((2, 2, 1), (2, 2, 1), (2, 2, 2), (2, 2, 2), (2, 2, 2))
    kernels = ((3, 3, 1), (3, 3, 1), (3, 3, 3), (3, 3, 3), (3, 3, 3), (3, 3, 3))
    skernels = ((3, 3, 1), (3, 3, 1), (3, 3, 3), (3, 3, 3), (3, 3, 3))
    # (D, H, W) at the input of each level
    shapes = [(64, 384, 384), (64, 192, 192), (64, 96, 96), (32, 48, 48),
              (16, 24, 24)]
    rng = np.random.default_rng(0)
    common = dict(norm="batch", dropout=0.1, dtype=jnp.bfloat16)
    for i, (d, h, w) in enumerate(shapes):
        cin = 1 if i == 0 else cfg_ch[i - 1]
        x = jnp.asarray(rng.normal(size=(1, d, h, w, cin)), jnp.bfloat16)
        down = ResidualUnit(cfg_ch[i], kernels[i], subunits=2, **common)
        ds = Convolution(cfg_ch[i], skernels[i], strides[i], **common)
        # jitted inits: eager flax init on the axon backend compiles
        # op-by-op through the remote service (minutes per level)
        keys = {"params": jax.random.key(0), "dropout": jax.random.key(1)}
        v1 = jax.jit(down.init, static_argnums=2)(keys, x, False)
        y = jax.jit(down.apply, static_argnums=2)(v1, x, False)
        v2 = jax.jit(ds.init, static_argnums=2)(keys, y, False)

        def enc(x):
            return ds.apply(v2, down.apply(v1, x, False), False)

        try:
            dt = _chain_timed(enc, x)
        except Exception as e:  # relay remote-compile size limits (HTTP 413)
            print(f"L{i} enc: skipped ({type(e).__name__})")
            continue
        # decoder at this level: input 2*ch (concat), att + 1-subunit resunit
        x2 = jnp.asarray(rng.normal(size=(1, d, h, w, 2 * cfg_ch[i])), jnp.bfloat16)
        att = AttentionBlock1(kernels[i], dtype=jnp.bfloat16)
        up = ResidualUnit(cfg_ch[i] if i else 2, kernels[i], subunits=1,
                          last_conv_only=(i == 0), **common)
        v3 = jax.jit(att.init, static_argnums=2)(keys, x2, False)
        v4 = jax.jit(up.init, static_argnums=2)(keys, x2, False)

        def dec(x2):
            from vs_seg_tpu.nn.blocks import attention_gate
            a, _ = att.apply(v3, x2, False)
            return up.apply(v4, attention_gate(a, x2), False)

        try:
            dt2 = _chain_timed(dec, x2)
        except Exception as e:
            print(f"L{i} dec: skipped ({type(e).__name__})")
            continue
        print(f"L{i} {d}x{h}x{w} c{cin}->{cfg_ch[i]}: enc {dt*1e3:7.2f} ms   "
              f"dec {dt2*1e3:7.2f} ms")
        sys.stdout.flush()


def profile_train(trace=False, batch=1):
    from vs_seg_tpu.core.config import Config
    from vs_seg_tpu.models import build_model
    from vs_seg_tpu.train.trainer import Trainer
    import jax.random as jrandom

    cfg = Config(compute_dtype="bfloat16")
    model = build_model(cfg)
    trainer = Trainer(cfg, model)
    state = trainer.init_state()
    rng = np.random.default_rng(0)
    image = jnp.asarray(rng.normal(size=(batch, 64, 384, 384, 1)),
                        jnp.float32)
    label = jnp.asarray((rng.random((batch, 64, 384, 384, 1)) > 0.9),
                        jnp.float32)

    # train_step donates params/batch_stats/opt_state/rng — thread them
    from vs_seg_tpu.train.trainer import wrap_rng_data
    carry = [state["params"], state["batch_stats"], state["opt_state"],
             wrap_rng_data(state["rng"])]

    def step():
        p, bs, o, key, loss = trainer.train_step(*carry, image, label)
        carry[:] = [p, bs, o, key]
        return loss

    sync(step())
    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        sync(step())
        best = min(best, time.perf_counter() - t0)
    print(f"train step (batch {batch}, 384x384x64): {best*1e3:.1f} ms "
          f"= {batch/best:.2f} volumes/sec")
    if trace:
        import os
        os.makedirs("runs/trace_r2", exist_ok=True)
        with jax.profiler.trace("runs/trace_r2"):
            sync(step())
        print("trace written to runs/trace_r2")
    sys.stdout.flush()


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "forward"
    if which in ("forward", "all"):
        profile_forward()
    if which in ("levels", "all"):
        profile_levels()
    if which in ("train", "all"):
        profile_train(batch=int(sys.argv[2]) if len(sys.argv) > 2 else 1)
    if which == "trace":
        profile_train(trace=True)
