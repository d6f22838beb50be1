"""Isolate the diff-march per-step cost: gather vs scatter vs elementwise.
Runs the EXACT bench loss at steps=24 under combinations of ablations."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from voxtracer.diff import volumetric as V
from voxtracer.scene.presets import monu_path

W, H = 1920, 1080
scene, cfg = monu_path(width=W, height=H, gridsize=64, which=(1, 2, 3),
                       bounces=4)
scene = jax.tree.map(jnp.asarray, scene)
params = V.params_from_scene(scene)
rows = -(-H // 2)
target = jnp.zeros((rows, W, 3), jnp.float32)
k = min(V.max_aabb_crossings(scene, cfg), scene.volumes.n)
row0 = jnp.float32(0)


def pull(x):
    return np.asarray(jnp.sum(jax.tree.leaves(x)[0].astype(jnp.float32)))


def timed(name, fn, *a, reps=3):
    pull(fn(*a))
    ts = []
    for _ in range(reps):
        t0 = time.time()
        pull(fn(*a))
        ts.append(time.time() - t0)
    print(f"{name:44s} {np.median(ts):7.3f} s", flush=True)


def loss(p, s):
    return V.mse_loss(p, scene, cfg, target, None, s, row0=row0,
                      rows=rows, k=k, span_steps=1)


for name, flags in (
        ("baseline", {}),
        ("no cell gather", {"_ABLATE_CELL_FETCH": True}),
        ("no scatter", {"_ABLATE_CELL_SCATTER": True}),
        ("no gather, no scatter", {"_ABLATE_CELL_FETCH": True,
                                   "_ABLATE_CELL_SCATTER": True}),
        ("no albedo lookup", {"_ABLATE_ALB_FETCH": True}),
        ("no lookups at all", {"_ABLATE_CELL_FETCH": True,
                               "_ABLATE_CELL_SCATTER": True,
                               "_ABLATE_ALB_FETCH": True,
                               "_ABLATE_BSIG_ADJ": True}),
):
    for f, v in flags.items():
        setattr(V, f, v)
    # render_diff is module-jitted: clear its trace cache or every variant
    # silently reruns the baseline program (hard-won lesson)
    V.render_diff._clear_cache()
    for s in (4, 24):
        timed(f"fwd {name} steps={s}",
              jax.jit(lambda p, s=s: loss(p, s)), params)
        timed(f"grad {name} steps={s}",
              jax.jit(jax.grad(lambda p, s=s: loss(p, s))), params)
    for f in flags:
        setattr(V, f, False)
