#!/usr/bin/env python
"""Backward timing at bench settings for importance-placed core samples:
fused grad-only step over the 2-band x (S,L) bins, long bin marched with
`importance=P` nodes.  Env: VARIANTS="2,10,0 2,10,8 2,6,8 2,8,8"
(binS,binL,P).  Chained-call timing (scalar pull per call)."""
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

from voxtracer.diff import volumetric as V
from voxtracer.render.camera import primary_rays
from voxtracer.render.sky import sample_sky
from voxtracer.scene.presets import monu_path

W, H = 1920, 1080
TILES_BWD = 2


def main():
    scene, cfg = monu_path(width=W, height=H, gridsize=64, which=(1, 2, 3),
                           bounces=4)
    scene = jax.tree.map(jnp.asarray, scene)
    params = V.params_from_scene(scene)
    rows = -(-H // TILES_BWD)
    denom = float(rows * W * 3)
    diff_k = min(V.max_aabb_crossings(scene, cfg), scene.volumes.n)

    bin_data, bin_idx = [], []
    for b in range(TILES_BWD):
        r0 = min(b * rows, H - rows)
        x = jnp.arange(W, dtype=jnp.float32)
        y = jnp.arange(rows, dtype=jnp.float32) + r0
        px, py = jnp.meshgrid(x, y)
        o, d = primary_rays(scene.camera, W, H, px.reshape(-1),
                            py.reshape(-1), None, jnp)
        bins = V.span_cells_bins(scene, cfg, row0=r0, rows=rows,
                                 edges=(4.0,))
        tgt = jnp.zeros((rows * W, 3), jnp.float32)
        for bi, p, ip, na in bins:
            nap = min(-(-na // 1024) * 1024, o.shape[0])
            sel = jnp.asarray(p[:nap])
            oc = jnp.take(o, sel, axis=0)
            dc = jnp.take(d, sel, axis=0)
            bg = sample_sky(scene.sky, dc, cfg.activate_sky, cfg.sky_fallback)
            t_act = jnp.take(tgt, sel, axis=0)
            sp = V.spans_for_rays(scene, oc, dc)
            bin_data.append(dict(oc=oc, dc=dc, bg=bg, t_act=t_act, sp=sp))
            bin_idx.append((bi, na))

    def make_step(bin_steps, imp):
        @jax.jit
        def step(bd):
            total = None
            for arrs, (bi, na) in zip(bd, bin_idx):
                g = jax.grad(V.mse_loss_active)(
                    params, scene, cfg, arrs["oc"], arrs["dc"], arrs["bg"],
                    arrs["t_act"], denom, bin_steps[bi], k=diff_k,
                    span_steps=1, clamp=bi > 0, n_active=na,
                    spans=arrs["sp"], importance=imp if bi > 0 else 0)
                total = g if total is None else jax.tree.map(jnp.add, total, g)
            return total
        return step

    for v in os.environ.get("VARIANTS", "2,10,0 2,10,8 2,6,8 2,8,8").split():
        s0, s1, p = (int(x) for x in v.split(","))
        step = make_step((s0, s1), p)
        g = step(bin_data)
        np.asarray(g.albedo_table[:1, :1])
        ts = []
        for _ in range(3):
            t0 = time.time()
            g = step(bin_data)
            np.asarray(g.albedo_table[:1, :1])
            ts.append(time.time() - t0)
        print(f"bins({s0},{s1}) imp={p}: {float(np.median(ts))*1e3:7.1f} ms",
              flush=True)


if __name__ == "__main__":
    main()
