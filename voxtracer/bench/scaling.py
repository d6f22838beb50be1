"""Scaling benchmark: rays/s at 1, 2, ..., N devices (BASELINE scaling
metric).  On real hardware this measures ICI scaling; under
--xla_force_host_platform_device_count it validates the machinery and
reports the (CPU-bound) curve.

Run: python -m voxtracer.bench.scaling [width height spp]
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def measure(width=256, height=144, spp=1, reps=3):
    import dataclasses

    import jax

    from voxtracer.dist.mesh import make_mesh, render_sharded
    from voxtracer.scene.presets import monu_path

    scene, cfg = monu_path(width=width, height=height, gridsize=64,
                           which=(1,), bounces=4)
    n_dev_all = len(jax.devices())
    results = []
    counts = [n for n in (1, 2, 4, 8, 16, 32) if n <= n_dev_all]
    for n in counts:
        mesh = make_mesh(n)
        key = jax.random.PRNGKey(0)
        img = render_sharded(scene, cfg, key, spp, mesh)  # warm
        np.asarray(img)
        t0 = time.time()
        for i in range(reps):
            img = render_sharded(scene, cfg, jax.random.fold_in(key, i), spp, mesh)
            np.asarray(img)
        dt = (time.time() - t0) / reps
        rays = width * height * spp / dt
        eff = 1.0 if not results else rays / (results[0]["rays_s"] * n)
        results.append(dict(devices=n, seconds=round(dt, 4),
                            rays_s=round(rays, 1),
                            efficiency=round(eff, 3)))
        print(json.dumps(results[-1]), file=sys.stderr)
    return results


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:]]
    out = measure(*args)
    print(json.dumps(out))
