#!/usr/bin/env python
"""city-XL frame timing under take/period variants (env knobs):
  VOX_PLAIN_TAKE=1      -> single [n,22] row gather (round-5 recorded path)
  VOX_REORDER_PERIOD=k  -> cfg.bounce_reorder_period
One large program per process (tunnel rule 6)."""
import dataclasses
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


def main():
    if os.environ.get("VOX_PLAIN_TAKE") == "1":
        integrator.take_rows = lambda m, i: jnp.take(m, i, axis=0)
    period = int(os.environ.get("VOX_REORDER_PERIOD", "2"))

    page = int(os.environ.get("VOX_PAGE", "0"))
    if page:
        from voxtracer.render.camera import make_camera
        scene, cfg = presets.city_path(nx=11, nz=10, vary_scale=True,
                                       page=page)
        scene = scene.replace(camera=make_camera(pos=(-3.4, 2.6, -5.6),
                                                 target=(0.0, 0.2, 0.0),
                                                 aspect=cfg.width / cfg.height))
    else:
        scene, cfg = presets.city_xl_path()
    cfg = dataclasses.replace(
        cfg, bounce_reorder_period=period,
        reorder_compact_chunks=int(os.environ.get("VOX_RCHUNKS", "1")))
    scene = jax.tree.map(jnp.asarray, scene)
    k = jax.random.PRNGKey(0)

    def once(kk):
        return np.asarray(jnp.mean(integrator._render_banded(scene, cfg, kk, 1, 1)))

    t0 = time.time()
    m = once(k)
    print(f"warm {time.time()-t0:.0f}s mean {float(m):.4f}", file=sys.stderr, flush=True)
    ts = []
    for i in range(3):
        t0 = time.time()
        once(jax.random.fold_in(k, i))
        ts.append(time.time() - t0)
    ms = float(np.median(ts)) * 1e3
    n = cfg.width * cfg.height
    print(f"plain={os.environ.get('VOX_PLAIN_TAKE','0')} period={period} page={page} "
          f"rchunks={os.environ.get('VOX_RCHUNKS','1')}: "
          f"{ms:.1f} ms  {n/ (ms/1e3) / 1e6:.2f} Mrays/s", flush=True)


if __name__ == "__main__":
    main()
