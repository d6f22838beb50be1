#!/usr/bin/env python
"""Same-process A/B of the whitted-queue child-compaction gather:
chunked <=8-col takes vs one [2W,12] take (today's tunnel, same worker)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import jax.numpy as jnp
import numpy as np

from voxtracer.render import integrator
from voxtracer.scene import presets
import dataclasses


def timed(fn, reps=5):
    fn()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) * 1e3


def main():
    scene, cfg = presets.room_whitted()
    scene = jax.tree.map(jnp.asarray, scene)

    orig = integrator.take_rows

    def plain(mat, idx):
        return jnp.take(mat, idx, axis=0)

    results = {}
    for name, impl, sortb in [("nosort", orig, False), ("sort", orig, True),
                              ("nosort2", orig, False), ("sort2", orig, True)]:
        integrator.take_rows = impl
        cfg = dataclasses.replace(cfg, whitted_sort_batch=sortb)

        k = jax.random.PRNGKey(0)
        ms = timed(lambda: np.asarray(jnp.mean(
            integrator._render_banded(scene, cfg, k, 1, 1))))
        results[name] = ms
        print(f"{name:10s}: {ms:7.1f} ms", flush=True)
    integrator.take_rows = orig


if __name__ == "__main__":
    main()
