"""Forward-only timing sweep: compaction chunks x band counts at 1080p."""
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from voxtracer.render.integrator import render_tiled
from voxtracer.scene.presets import monu_path

W, H = 1920, 1080
scene, cfg0 = monu_path(width=W, height=H, gridsize=64, which=(1, 2, 3), bounces=4)
scene = jax.tree.map(jnp.asarray, scene)
key = jax.random.PRNGKey(0)

combos = [(int(c), int(t)) for c, t in
          (p.split(":") for p in os.environ.get(
              "SWEEP", "1:16,4:16,8:16,4:8,8:8,8:4").split(","))]

for chunks, tiles in combos:
    cfg = dataclasses.replace(cfg0, compact_chunks=chunks, compact_min=1024)
    img = render_tiled(scene, cfg, key, 1, tiles)  # compile + warm
    t0 = time.time()
    img = render_tiled(scene, cfg, jax.random.fold_in(key, 1), 1, tiles)
    dt = time.time() - t0
    print(f"chunks={chunks:2d} tiles={tiles:2d}: {dt:6.2f} s  "
          f"({W*H/dt/1e6:.3f} Mrays/s)  mean={np.asarray(img).mean():.5f}",
          flush=True)
