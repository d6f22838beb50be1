"""Probe: per-bounce active-ray fraction + traversal timing on the bench
scene — decides whether between-bounce wavefront compaction pays."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from voxtracer.render import integrator as I
from voxtracer.render.camera import primary_rays
from voxtracer.scene.presets import monu_path

W, H = 1920, 1080
ROWS = H // 16  # one bench band

scene, cfg = monu_path(width=W, height=H, gridsize=64, which=(1, 2, 3), bounces=4)
scene = jax.tree.map(jnp.asarray, scene)
key = jax.random.PRNGKey(0)

x = jnp.arange(W, dtype=jnp.float32)
y = jnp.arange(ROWS, dtype=jnp.float32) + 8 * ROWS  # middle band
px, py = jnp.meshgrid(x, y)
px, py = px.reshape(-1), py.reshape(-1)
u = jax.random.uniform(jax.random.fold_in(key, 100), (px.shape[0], 2))
o, d = primary_rays(scene.camera, W, H, px + u[:, 0], py + u[:, 1], None, jnp)
n = o.shape[0]
print("band rays:", n)


@jax.jit
def survival(scene, o, d, key):
    """Replay trace_path's activity bookkeeping, return per-bounce counts."""
    st = dict(o=I.cpack(o), d=I.cpack(d), active=jnp.ones(n, bool),
              in_glass=jnp.zeros(n, bool))
    counts = []
    for depth in range(cfg.max_bounces + 1):
        bkey = jax.random.fold_in(key, depth)
        counts.append(jnp.sum(st["active"]))
        rec = I.find_nearest_world(scene, st["o"], st["d"], st["active"])
        mat = rec["mat"]
        nrm = (rec["nx"], rec["ny"], rec["nz"])
        miss = st["active"] & (mat == I.MAT_NONE)
        active = st["active"] & ~miss & ~(mat == 15)
        t = rec["t"]
        p = I.cadd(st["o"], I.cscale(t, st["d"]))
        u_s = jax.random.uniform(jax.random.fold_in(bkey, 3), (3, n))
        sph = I.csphere_sample(u_s[0], u_s[1], u_s[2])
        nd = I.cunit(I.cadd(nrm, sph))
        st = dict(o=I.coffset(p, nrm), d=nd, active=active,
                  in_glass=st["in_glass"])
    return jnp.stack(counts)


c = np.asarray(survival(scene, o, d, key))
print("active per bounce:", c, " fractions:", np.round(c / n, 3))
