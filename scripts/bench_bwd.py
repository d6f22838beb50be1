"""Backward-pass decomposition: which adjoint dominates grad_fn time."""
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
TILES = 4
scene, cfg = monu_path(width=W, height=H, gridsize=64, which=(1, 2, 3), bounces=4)
scene = jax.tree.map(jnp.asarray, scene)
params = V.params_from_scene(scene)
rows = -(-H // TILES)
target = jnp.zeros((rows, W, 3), jnp.float32)
k = min(V.max_aabb_crossings(scene, cfg), scene.volumes.n)
print("diff k =", k, " band rays =", rows * W)


def pull(x):
    """block_until_ready is a no-op through the axon tunnel (measured,
    PERF_NOTES.md) — force completion with a scalar host pull."""
    return np.asarray(jnp.sum(jax.tree.leaves(x)[0].astype(jnp.float32)))


def timed(name, fn, *a, reps=3):
    pull(fn(*a))  # compile+warm
    ts = []
    for _ in range(reps):
        t0 = time.time()
        pull(fn(*a))
        ts.append(time.time() - t0)
    print(f"{name:28s} {np.median(ts):7.3f} s", flush=True)


row0 = jnp.float32(0)

fwd = jax.jit(lambda p: V.mse_loss(p, scene, cfg, target, None, 48,
                                   row0=row0, rows=rows, k=k),
              static_argnames=())
timed("forward loss (1 band)", fwd, params)

g_full = jax.jit(jax.grad(lambda p: V.mse_loss(p, scene, cfg, target, None,
                                               48, row0=row0, rows=rows, k=k)))
timed("grad both (1 band)", g_full, params)

g_dens = jax.jit(jax.grad(lambda p: V.mse_loss(
    V.DiffParams(p.density_logits, jax.lax.stop_gradient(p.albedo_table)),
    scene, cfg, target, None, 48, row0=row0, rows=rows, k=k)))
timed("grad density only", g_dens, params)

g_alb = jax.jit(jax.grad(lambda p: V.mse_loss(
    V.DiffParams(jax.lax.stop_gradient(p.density_logits), p.albedo_table),
    scene, cfg, target, None, 48, row0=row0, rows=rows, k=k)))
timed("grad albedo only", g_alb, params)

# ---- no-remat variant + band-count scaling
V._REMAT = False
g_nr = jax.jit(jax.grad(lambda p: V.mse_loss(p, scene, cfg, target, None,
                                             48, row0=row0, rows=rows, k=k)))
try:
    timed("grad both, NO remat", g_nr, params)
except Exception as e:
    print("no-remat failed:", type(e).__name__, str(e)[:200])
V._REMAT = True

for tiles in (2, 1):
    r2 = -(-H // tiles)
    tgt2 = jnp.zeros((r2, W, 3), jnp.float32)
    g2 = jax.jit(jax.grad(lambda p: V.mse_loss(p, scene, cfg, tgt2, None,
                                               48, row0=jnp.float32(0),
                                               rows=r2, k=k)))
    try:
        timed(f"grad both ({tiles}-band rows)", g2, params)
    except Exception as e:
        print(f"tiles={tiles} failed:", type(e).__name__, str(e)[:200])

# ---- occupancy-span-tightened march (VERDICT item 4 redesign)
for (steps, span, tiles) in ((48, 0, 4), (24, 4, 4), (16, 4, 4),
                             (16, 4, 1), (24, 4, 1), (12, 3, 1)):
    r2 = -(-H // tiles)
    tgt2 = jnp.zeros((r2, W, 3), jnp.float32)
    g2 = jax.jit(jax.grad(lambda p, s=steps, sp=span, r=r2, t=tgt2:
                          V.mse_loss(p, scene, cfg, t, None, s,
                                     row0=jnp.float32(0), rows=r,
                                     k=k, span_steps=sp)))
    try:
        timed(f"grad steps={steps} span={span} tiles={tiles}", g2, params)
    except Exception as e:
        print(f"steps={steps} span={span} failed:",
              type(e).__name__, str(e)[:160])

# ---- union-span march (round-2 final form)
for (steps, span, tiles) in ((16, 2, 1), (20, 2, 1), (24, 2, 1),
                             (16, 2, 2), (12, 2, 1)):
    r2 = -(-H // tiles)
    tgt2 = jnp.zeros((r2, W, 3), jnp.float32)
    g2 = jax.jit(jax.grad(lambda p, s=steps, sp=span, r=r2, t=tgt2:
                          V.mse_loss(p, scene, cfg, t, None, s,
                                     row0=jnp.float32(0), rows=r,
                                     k=k, span_steps=sp)))
    try:
        timed(f"grad UNION steps={steps} span={span} tiles={tiles}",
              g2, params)
    except Exception as e:
        print(f"union steps={steps} failed:", type(e).__name__, str(e)[:160])
