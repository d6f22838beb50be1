#!/usr/bin/env python
"""City (BASELINE config 5, 17 instances) forward bench at 1080p —
records the multi-instance scene number (VERDICT item 3)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from voxtracer.render.integrator import _render_banded
from voxtracer.scene.presets import city_path

W, H = 1920, 1080


def pull_timed(name, fn, reps=3):
    fn(0)
    ts = []
    for i in range(reps):
        t0 = time.time()
        fn(i + 1)
        ts.append(time.time() - t0)
    t = float(np.median(ts))
    print(f"{name:32s} {t:6.2f} s  ({W*H/t/1e6:6.3f} Mrays/s)", flush=True)
    return t


def main():
    scene, cfg = city_path(width=W, height=H, gridsize=64, nx=4, nz=4,
                           bounces=4)
    scene = jax.tree.map(jnp.asarray, scene)
    key = jax.random.PRNGKey(0)
    print("volumes:", scene.volumes.n, flush=True)

    def once(i, c):
        return np.asarray(jnp.mean(_render_banded(
            scene, c, jax.random.fold_in(key, i), 1, 1)))

    pull_timed("city 1080p path fwd (dense)", lambda i: once(i, cfg))


if __name__ == "__main__":
    main()
