#!/usr/bin/env python
"""City artifact render (separate from render_artifacts.py so a rerun
after the exit-kernel VMEM fix doesn't redo the other four)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from voxtracer.io.image import write_png
from voxtracer.render.integrator import render_tiled
from voxtracer.render.tonemap import to_rgb8
from voxtracer.scene.presets import city_path

ART = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "artifacts")
os.makedirs(ART, exist_ok=True)

scene, cfg = city_path(width=1920, height=1080, gridsize=64, nx=4, nz=4,
                       bounces=4)
scene = jax.tree.map(jnp.asarray, scene)
t0 = time.time()
img = render_tiled(scene, cfg, jax.random.PRNGKey(0), 64, 2)
rgb = np.asarray(to_rgb8(jnp.asarray(img)))
write_png(os.path.join(ART, "city_path_1080p.png"), rgb)
print(f"city_path_1080p.png: 64 spp in {time.time()-t0:.1f}s", flush=True)
