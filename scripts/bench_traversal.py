#!/usr/bin/env python
"""Head-to-head: Pallas VMEM traversal vs XLA occupancy traversal on the
monu bench scene (VERDICT.md item 1: measure, don't assert).

Times a full-frame nearest pass + an occluded pass over primary rays at
the given resolution.  Honest tunnel timing: scalar host pull per run.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def log(*a):
    print(*a, flush=True)


def pull(x):
    return np.asarray(jnp.sum(jax.tree.leaves(x)[0].astype(jnp.float32)))


def timed(fn, *args, reps=5, **kw):
    pull(fn(*args, **kw))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        pull(fn(*args, **kw))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    W = int(os.environ.get("BT_WIDTH", 1920))
    H = int(os.environ.get("BT_HEIGHT", 1080))
    BR = int(os.environ.get("BT_BLOCK_ROWS", 16))
    from voxtracer.kernels import dda_occ
    from voxtracer.kernels.pallas_dda import traverse_pallas
    from voxtracer.render.camera import primary_rays
    from voxtracer.render.integrator import _pixel_grid, _topk, _vol_args
    from voxtracer.scene.presets import monu_path

    log("devices:", jax.devices())
    scene, cfg = monu_path(width=W, height=H, gridsize=64, which=(1, 2, 3),
                           bounces=4)
    scene = jax.tree.map(jnp.asarray, scene)
    px, py = _pixel_grid(cfg)
    o, d = primary_rays(scene.camera, W, H, px, py, None, jnp)
    n = o.shape[0]
    act = jnp.ones(n, bool)
    tl = jnp.full(n, 1e34, jnp.float32)
    ven = jnp.ones(scene.volumes.n, bool)
    kw = dict(occ=scene.volumes.occ, bricksize=scene.volumes.bricksize)
    args = (*_vol_args(scene), o, d, tl, act, ven)
    log(f"rays: {n}  volumes: {scene.volumes.n}  topk: {_topk(scene)}")

    import functools
    f_xla = jax.jit(functools.partial(
        dda_occ.traverse_occ_topk, mode="nearest", k=_topk(scene)))
    f_pl = jax.jit(functools.partial(
        traverse_pallas, mode="nearest", block_rows=BR))

    r_xla = f_xla(*args, **kw)
    r_pl = f_pl(*args, **kw)
    hx = np.asarray(r_xla["hit"])
    hp = np.asarray(r_pl["hit"])
    log(f"hit parity: {np.mean(hx == hp):.6f} (xla {hx.mean():.4f}, "
        f"pallas {hp.mean():.4f})")
    tx, tp = np.asarray(r_xla["t"]), np.asarray(r_pl["t"])
    m = hx & hp
    log(f"t allclose on hits: "
        f"{np.allclose(tx[m], tp[m], rtol=1e-6, atol=1e-6)}  "
        f"cell equal: {np.array_equal(np.asarray(r_xla['cell'])[m], np.asarray(r_pl['cell'])[m])}  "
        f"vol equal: {np.array_equal(np.asarray(r_xla['vol'])[m], np.asarray(r_pl['vol'])[m])}")

    t_xla = timed(f_xla, *args, **kw)
    t_pl = timed(f_pl, *args, **kw)
    log(f"nearest  XLA: {t_xla*1e3:8.1f} ms   ({n/t_xla/1e6:7.2f} Mrays/s)")
    log(f"nearest  PAL: {t_pl*1e3:8.1f} ms   ({n/t_pl/1e6:7.2f} Mrays/s)")
    log(f"speedup: {t_xla/t_pl:.2f}x")

    # occluded with finite limits (shadow-ray-like)
    tl2 = jnp.full(n, 3.0, jnp.float32)
    o_xla = jax.jit(functools.partial(
        dda_occ.traverse_occ_topk, mode="occluded", k=_topk(scene)))
    o_pl = jax.jit(functools.partial(
        traverse_pallas, mode="occluded", block_rows=BR))
    ox = o_xla(*_vol_args(scene), o, d, tl2, act, ven, **kw)
    op = o_pl(*_vol_args(scene), o, d, tl2, act, ven, **kw)
    log(f"occluded parity: "
        f"{np.mean(np.asarray(ox['hit']) == np.asarray(op['hit'])):.6f}")
    t_xla2 = timed(o_xla, *_vol_args(scene), o, d, tl2, act, ven, **kw)
    t_pl2 = timed(o_pl, *_vol_args(scene), o, d, tl2, act, ven, **kw)
    log(f"occluded XLA: {t_xla2*1e3:8.1f} ms   ({n/t_xla2/1e6:7.2f} Mrays/s)")
    log(f"occluded PAL: {t_pl2*1e3:8.1f} ms   ({n/t_pl2/1e6:7.2f} Mrays/s)")
    log(f"speedup: {t_xla2/t_pl2:.2f}x")


if __name__ == "__main__":
    main()
