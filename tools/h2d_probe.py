#!/usr/bin/env python3
"""Probe H2D staging throughput over the axon relay: stream count x chunk
size sweep for jax.device_put of a 16 MB uint8 volume (the bench's staged
transfer). Round-2 measured ~45 MB/s at 4 streams; this maps the landscape to
find the ceiling. Sync via scalar readback (block_until_ready is a no-op on
the relay)."""

import time
from concurrent.futures import ThreadPoolExecutor

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_platforms", "axon,cpu")


def run(n_streams: int, n_chunks: int, nbytes: int, reps: int = 3) -> float:
    data = np.random.default_rng(0).integers(0, 255, size=nbytes,
                                             dtype=np.uint8)
    pool = ThreadPoolExecutor(n_streams)
    bounds = np.linspace(0, nbytes, n_chunks + 1).astype(int)
    best = 0.0
    for _ in range(reps):
        t0 = time.perf_counter()
        futs = [pool.submit(jax.device_put, data[a:b])
                for a, b in zip(bounds[:-1], bounds[1:])]
        parts = [f.result() for f in futs]
        # sync: touch one element of every part
        float(sum(jnp.sum(p[:1].astype(jnp.int32)) for p in parts))
        dt = time.perf_counter() - t0
        best = max(best, nbytes / dt / 1e6)
        del parts
    pool.shutdown()
    return best


def main():
    print("device:", jax.devices()[0].platform)
    nbytes = 16 * 1024 * 1024
    # warm up transfer path
    run(1, 1, 1 << 20, reps=1)
    for n_streams, n_chunks in [(1, 1), (2, 2), (4, 4), (4, 8), (8, 8),
                                (8, 16), (16, 16), (16, 32), (32, 32)]:
        mbps = run(n_streams, n_chunks, nbytes)
        print(f"streams={n_streams:3d} chunks={n_chunks:3d}: {mbps:7.1f} MB/s",
              flush=True)


if __name__ == "__main__":
    main()
