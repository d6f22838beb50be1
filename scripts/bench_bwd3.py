"""Round-3 backward decomposition at the EXACT bench settings
(steps=12, span=1, k=2, half-frame band): which part of grad time is
cell-scatter, which is the brick one-hot adjoint, which is march compute.

Ablations zero one adjoint path at trace time (volumetric._ABLATE_*);
forward values are unchanged so timings are comparable.
"""
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
TILES = int(os.environ.get("TILES", 2))
STEPS = int(os.environ.get("STEPS", 12))
SPAN = int(os.environ.get("SPAN", 1))
scene, cfg = monu_path(width=W, height=H, gridsize=64, which=(1, 2, 3),
                       bounces=4)
scene = jax.tree.map(jnp.asarray, scene)
params = V.params_from_scene(scene)
rows = -(-H // TILES)
target = jnp.zeros((rows, W, 3), jnp.float32)
k = min(V.max_aabb_crossings(scene, cfg), scene.volumes.n)
print(f"k={k} band rays={rows * W} steps={STEPS} span={SPAN}", flush=True)
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
    print(f"{name:36s} {np.median(ts):7.3f} s", flush=True)


def loss(p):
    return V.mse_loss(p, scene, cfg, target, None, STEPS, row0=row0,
                      rows=rows, k=k, span_steps=SPAN)


timed("fwd loss", jax.jit(loss), params)
timed("grad full", jax.jit(jax.grad(loss)), params)

V._ABLATE_CELL_SCATTER = True
timed("grad, cell-scatter ablated", jax.jit(jax.grad(loss)), params)
V._ABLATE_BSIG_ADJ = True
timed("grad, scatter+bsig ablated", jax.jit(jax.grad(loss)), params)
V._ABLATE_CELL_SCATTER = False
timed("grad, bsig ablated", jax.jit(jax.grad(loss)), params)
V._ABLATE_BSIG_ADJ = False


def loss_dens(p):
    return V.mse_loss(V.DiffParams(p.density_logits,
                                   jax.lax.stop_gradient(p.albedo_table)),
                      scene, cfg, target, None, STEPS, row0=row0, rows=rows,
                      k=k, span_steps=SPAN)


def loss_alb(p):
    return V.mse_loss(V.DiffParams(jax.lax.stop_gradient(p.density_logits),
                                   p.albedo_table),
                      scene, cfg, target, None, STEPS, row0=row0, rows=rows,
                      k=k, span_steps=SPAN)


timed("grad density only", jax.jit(jax.grad(loss_dens)), params)
timed("grad albedo only", jax.jit(jax.grad(loss_alb)), params)

V._ABLATE_CLAMP = True
timed("fwd, clamp pass ablated", jax.jit(loss), params)
timed("grad, clamp pass ablated", jax.jit(jax.grad(loss)), params)
V._ABLATE_SPANS = True
timed("fwd, clamp+spans ablated", jax.jit(loss), params)
timed("grad, clamp+spans ablated", jax.jit(jax.grad(loss)), params)
V._ABLATE_CLAMP = False
V._ABLATE_SPANS = False


def loss_steps(p, s):
    return V.mse_loss(p, scene, cfg, target, None, s, row0=row0,
                      rows=rows, k=k, span_steps=SPAN)


for s in (4, 24):
    timed(f"fwd steps={s}", jax.jit(lambda p, s=s: loss_steps(p, s)), params)
    timed(f"grad steps={s}",
          jax.jit(jax.grad(lambda p, s=s: loss_steps(p, s))), params)
