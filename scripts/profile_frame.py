#!/usr/bin/env python
"""Decompose the 1080p monu path-frame cost: which pass dominates now that
traversal is a Pallas kernel. Honest tunnel timing (host pulls)."""
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from voxtracer.render.integrator import (_pixel_grid, _sample_pixels,
                                         find_nearest_world,
                                         is_occluded_world,
                                         material_exit_world, render_tiled,
                                         trace_path)
from voxtracer.render.camera import primary_rays
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
    print(f"{name:36s} {np.median(ts)*1e3:9.1f} ms", flush=True)
    return float(np.median(ts))


scene, cfg0 = monu_path(width=W, height=H, gridsize=64, which=(1, 2, 3),
                        bounces=4)
scene = jax.tree.map(jnp.asarray, scene)
key = jax.random.PRNGKey(0)
px, py = _pixel_grid(cfg0)
o, d = primary_rays(scene.camera, W, H, px, py, None, jnp)
n = o.shape[0]
act = jnp.ones(n, bool)

timed("nearest (full frame)",
      jax.jit(lambda o, d: find_nearest_world(scene, o, d, act)["t"]), o, d)
timed("occluded (full frame)",
      jax.jit(lambda o, d: is_occluded_world(
          scene, o, d, jnp.full(n, 3.0, jnp.float32), act)), o, d)
timed("exit march (full frame)",
      jax.jit(lambda o, d: material_exit_world(
          scene, o, d, jnp.zeros(n, jnp.int32), jnp.zeros(n, jnp.int32),
          act)[1]), o, d)

for mode, bounces in (("primary", 1), ("path", 1), ("path", 2), ("path", 4)):
    cfg = dataclasses.replace(cfg0, mode=mode, max_bounces=bounces,
                              compact_chunks=1)
    f = jax.jit(lambda k, cfg=cfg: _sample_pixels(scene, cfg, k, px, py))
    timed(f"{mode} bounces={bounces} (1 dispatch)", f, key)

# compaction on/off at full depth
for chunks in (1, 4):
    cfg = dataclasses.replace(cfg0, compact_chunks=chunks)
    f = jax.jit(lambda k, cfg=cfg: _sample_pixels(scene, cfg, k, px, py))
    timed(f"path bounces=4 chunks={chunks}", f, key)
