#!/usr/bin/env python
"""Kernel-knob sweep for the room g=128 walk (VERDICT r4 item 4 residual:
the whitted floor is ~170 ms of traversal at the g=128 interior walk
rate; knobs were only ever tuned on monu g=64).  Chained fori_loop-free
timing: K chained calls inside one jit, (t_2K - t_K)/K."""
import itertools
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import jax.numpy as jnp
import numpy as np

from voxtracer.kernels.pallas_dda import traverse_pallas
from voxtracer.render.camera import primary_rays
from voxtracer.render.integrator import _pallas_occ_args, _pixel_grid, _vol_args
from voxtracer.scene.presets import room_whitted


def pull(x):
    return np.asarray(x)


def timed(fn, *a, reps=3):
    pull(fn(*a))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        pull(fn(*a))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    scene, cfg = room_whitted()
    scene = jax.tree.map(jnp.asarray, scene)
    px, py = _pixel_grid(cfg)
    o, d = primary_rays(scene.camera, cfg.width, cfg.height, px, py, None, jnp)
    n = o.shape[0]
    act = jnp.ones(n, bool)
    tl = jnp.full(n, 1e34, jnp.float32)
    ven = jnp.ones(scene.volumes.n, bool)
    vargs = _vol_args(scene)
    occ_kw = _pallas_occ_args(scene)

    def chain(mode, mp, inn, br):
        @jax.jit
        def f(k, oo):
            def body(i, acc):
                res = traverse_pallas(*vargs, oo, d, tl, act, ven, **occ_kw,
                                      mode=mode, macro_pre=mp, inner=inn,
                                      block_rows=br)
                return acc + jnp.sum(res["t"] * 0 + res["t"][0])
            return jax.lax.fori_loop(0, k, body, jnp.float32(0))

        # data-dependence: perturb origin per iter to stop CSE
        @jax.jit
        def g(k):
            def body(i, carry):
                oo, acc = carry
                res = traverse_pallas(*vargs, oo, d, tl, act, ven, **occ_kw,
                                      mode=mode, macro_pre=mp, inner=inn,
                                      block_rows=br)
                oo = oo + res["t"][:1] * 1e-12
                return oo, acc + res["t"][0]
            oo, acc = jax.lax.fori_loop(0, k, body, (o, jnp.float32(0)))
            return acc
        return g

    combos = [(mp, inn, br)
              for mp in (1, 2, 3, 4)
              for inn in (8, 12)
              for br in (8,)]
    for mode in ("nearest", "occluded"):
        for mp, inn, br in combos:
            g = chain(mode, mp, inn, br)
            t1 = timed(g, jnp.int32(4))
            t2 = timed(g, jnp.int32(8))
            ms = (t2 - t1) / 4 * 1e3
            print(f"{mode:9s} macro_pre={mp} inner={inn:2d} br={br}: "
                  f"{ms:6.2f} ms/pass", flush=True)


if __name__ == "__main__":
    main()
