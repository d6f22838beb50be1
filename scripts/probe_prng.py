#!/usr/bin/env python
"""Is threefry RNG a big slice of the path-frame shading glue?  Compare
full-frame path render with threefry vs rbg keys, plus raw PRNG cost."""
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from voxtracer.render.integrator import _pixel_grid, _sample_pixels
from voxtracer.scene.presets import monu_path

W, H = 1920, 1080


def pull(x):
    return np.asarray(jnp.sum(jax.tree.leaves(x)[0].astype(jnp.float32)))


def timed(name, fn, *a, reps=3):
    pull(fn(*a))
    ts = []
    for _ in range(reps):
        t0 = time.time()
        pull(fn(*a))
        ts.append(time.time() - t0)
    print(f"{name:40s} {np.median(ts)*1e3:9.1f} ms", flush=True)


scene, cfg0 = monu_path(width=W, height=H, gridsize=64, which=(1, 2, 3),
                        bounces=4)
scene = jax.tree.map(jnp.asarray, scene)
cfg = dataclasses.replace(cfg0, compact_chunks=1)
px, py = _pixel_grid(cfg)
n = W * H

# raw cost: the per-bounce RNG draws (6 uniforms + 2 normals of [3, n])
def draws(key):
    out = jnp.float32(0)
    for i in range(4):
        k = jax.random.fold_in(key, i)
        for j in (1, 3, 5, 6, 7):
            u = jax.random.uniform(jax.random.fold_in(k, j), (3, n))
            out = out + u.sum()
        for j in (4, 8):
            g = jax.random.normal(jax.random.fold_in(k, j), (3, n))
            out = out + g.sum()
    return out


f = jax.jit(_sample_pixels, static_argnames=("cfg",))
for impl in ("threefry2x32", "rbg"):
    key = jax.random.key(0, impl=impl)
    timed(f"raw per-frame RNG draws [{impl}]", jax.jit(draws), key)
    timed(f"path frame bounces=4 [{impl}]",
          lambda k: f(scene, cfg, k, px, py), key)
