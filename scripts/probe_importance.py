#!/usr/bin/env python
"""Importance-placed core samples (volumetric.py `importance=P`): per-volume
density-grad cosines vs the 48-step reference at 256x144 monu, for the
official bins and rows-cutting candidates.  Env: VARIANTS="2,10,0 2,10,8
2,6,8 2,8,8" (binS,binL,P).  One process, small programs."""
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

from voxtracer.diff.volumetric import (max_aabb_crossings, mse_loss,
                                       params_from_scene, span_cells_bins)
from voxtracer.scene.presets import monu_path

W, H = 256, 144


def main():
    scene, cfg = monu_path(width=W, height=H, gridsize=64, which=(1, 2, 3),
                           bounces=4)
    scene = jax.tree.map(jnp.asarray, scene)
    params = params_from_scene(scene)
    kk = min(max_aabb_crossings(scene, cfg), scene.volumes.n)
    tgt = jnp.asarray(np.random.RandomState(1).rand(H, W, 3)
                      .astype(np.float32))
    bins = span_cells_bins(scene, cfg, rows=H, edges=(4.0,))
    key = jax.random.PRNGKey(2)

    def binned_grad(steps_map, span, importance=0):
        tot = None
        for bi, p, ip, na in bins:
            imp = importance if bi > 0 else 0  # long-span bin only
            g = jax.grad(mse_loss)(params, scene, cfg, tgt, key,
                                   steps_map[bi], row0=jnp.float32(0),
                                   rows=H, k=kk, span_steps=span,
                                   perm=jnp.asarray(p),
                                   inv_perm=jnp.asarray(ip), n_active=na,
                                   importance=imp)
            tot = g if tot is None else jax.tree.map(jnp.add, tot, g)
        return tot

    t0 = time.time()
    g_ref = binned_grad((48, 48), 4)
    gr = np.asarray(g_ref.density_logits)
    print(f"ref grad {time.time()-t0:.0f}s", file=sys.stderr, flush=True)

    variants = os.environ.get(
        "VARIANTS", "2,10,0 2,10,8 2,6,8 2,8,8 2,10,12").split()
    for v in variants:
        s0, s1, p = (int(x) for x in v.split(","))
        t0 = time.time()
        g = binned_grad((s0, s1), 1, importance=p)
        gf = np.asarray(g.density_logits)
        glob = float(np.dot(gf.ravel(), gr.ravel())
                     / (np.linalg.norm(gf) * np.linalg.norm(gr) + 1e-30))
        pv = []
        for vi in range(gf.shape[0]):
            a, r = gf[vi].ravel(), gr[vi].ravel()
            pv.append(round(float(np.dot(a, r)
                                  / (np.linalg.norm(a) * np.linalg.norm(r)
                                     + 1e-30)), 3))
        print(f"bins({s0},{s1}) imp={p}: global {glob:.4f} pervol {pv} "
              f"({time.time()-t0:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
