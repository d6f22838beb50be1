"""What makes one diff-march step cost ~7 ns/ray when its arithmetic is
~0.05 ns?  Build the march up from pieces over the same 1M-ray population
and time fwd + grad of each variant at steps 4 vs 24 (slope = per-step)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

N = 1036800
F32 = jnp.float32


def pull(x):
    return np.asarray(jnp.sum(jax.tree.leaves(x)[0].astype(jnp.float32)))


def timed(name, fn, *a, reps=3):
    pull(fn(*a))
    ts = []
    for _ in range(reps):
        t0 = time.time()
        pull(fn(*a))
        ts.append(time.time() - t0)
    print(f"{name:46s} {np.median(ts):7.3f} s", flush=True)


key = jax.random.PRNGKey(0)
u0 = jax.random.uniform(key, (N,), F32)
dt_u = jax.random.uniform(jax.random.fold_in(key, 1), (N,), F32) * 0.01
vox = jax.random.uniform(jax.random.fold_in(key, 2), (2, N), F32)
vdx = jax.random.uniform(jax.random.fold_in(key, 3), (2, N), F32) + 0.5
dens = jax.random.uniform(jax.random.fold_in(key, 4), (1048576,), F32)


def carry_only(sig_scale, steps):
    def body(c, ki):
        trans, cr = c
        alpha = 1.0 - jnp.exp(-sig_scale * dt_u)
        cr = cr + trans * alpha
        return (trans * (1.0 - alpha), cr), None
    (trans, cr), _ = jax.lax.scan(body, (jnp.ones(N, F32),
                                         jnp.zeros(N, F32)),
                                  jnp.arange(steps, dtype=F32))
    return jnp.mean(cr)


def coords_body(sig_scale, steps, pairs=2, gather=False, carry4=True):
    def body(c, ki):
        trans, cr, cg, cb = c
        t_mid = u0 + (ki + 0.5) * dt_u
        flat = jnp.zeros(N, jnp.int32)
        inside_any = jnp.zeros(N, bool)
        for j in range(pairs):
            lx = (vox[j] + t_mid * vdx[j]) * 64.0
            ly = (vox[j] + t_mid * vdx[j] * 0.9) * 64.0
            lz = (vox[j] + t_mid * vdx[j] * 1.1) * 64.0
            ix = jnp.clip(lx.astype(jnp.int32), 0, 63)
            iy = jnp.clip(ly.astype(jnp.int32), 0, 63)
            iz = jnp.clip(lz.astype(jnp.int32), 0, 63)
            inside = ((lx >= 0.0) & (lx < 64.0) & (ly >= 0.0) & (ly < 64.0)
                      & (lz >= 0.0) & (lz < 64.0))
            f = (ix * 64 + iy) * 64 + iz
            flat = jnp.where(inside & ~inside_any, f, flat)
            inside_any = inside_any | inside
        if gather:
            s = jnp.take(dens, flat, mode="clip") * sig_scale
        else:
            s = jnp.where(inside_any, sig_scale, 0.0)
        alpha = 1.0 - jnp.exp(-s * dt_u)
        wgt = trans * alpha
        cr = cr + wgt * 0.7
        cg = cg + wgt * 0.6
        cb = cb + wgt * 0.5
        return (trans * (1.0 - alpha), cr, cg, cb), None

    init = (jnp.ones(N, F32), jnp.zeros(N, F32), jnp.zeros(N, F32),
            jnp.zeros(N, F32))
    (trans, cr, cg, cb), _ = jax.lax.scan(body, init,
                                          jnp.arange(steps, dtype=F32))
    return jnp.mean(cr + cg + cb)


for s in (4, 24):
    timed(f"carry-only fwd steps={s}",
          jax.jit(lambda x, s=s: carry_only(x, s)), 0.5)
    timed(f"carry-only grad steps={s}",
          jax.jit(jax.grad(lambda x, s=s: carry_only(x, s))), 0.5)
for s in (4, 24):
    timed(f"coords 2-pair fwd steps={s}",
          jax.jit(lambda x, s=s: coords_body(x, s)), 0.5)
    timed(f"coords 2-pair grad steps={s}",
          jax.jit(jax.grad(lambda x, s=s: coords_body(x, s))), 0.5)
for s in (4, 24):
    timed(f"coords 1-pair fwd steps={s}",
          jax.jit(lambda x, s=s: coords_body(x, s, pairs=1)), 0.5)
for s in (4, 24):
    timed(f"coords+gather fwd steps={s}",
          jax.jit(lambda x, s=s: coords_body(x, s, gather=True)), 0.5)
    timed(f"coords+gather grad steps={s}",
          jax.jit(jax.grad(lambda x, s=s: coords_body(x, s, gather=True))),
          0.5)

# ---- faithful clones of the real ustep's custom_vjp pieces --------------
# (fresh custom_vjp objects per variant: jax memoizes custom_vjp traces
# per (fun, avals) for the life of the process — in-place flag ablations
# silently rerun the first-traced program; hard-won lesson)

def make_cell_fetch():
    @jax.custom_vjp
    def cf(dens_flat, cell_tab, idx):
        return jnp.take(cell_tab, idx, axis=0, mode="clip")

    def fwd(dens_flat, cell_tab, idx):
        return cf(dens_flat, cell_tab, idx), (idx, dens_flat.shape[0])

    def bwd(res, ct):
        idx, t = res
        ci = jnp.clip(idx, 0, t - 1)
        return jnp.zeros((t,), ct.dtype).at[ci].add(ct[:, 0]), None, None

    cf.defvjp(fwd, bwd)
    return cf


def make_rows():
    @jax.custom_vjp
    def rows(table, idx):
        from voxtracer.kernels.lookup import lookup_rows
        return lookup_rows(table, idx)

    def fwd(table, idx):
        return rows(table, idx), (idx, table.shape[0])

    def bwd(res, ct):
        idx, t = res
        oh = (idx[:, None] == jnp.arange(t, dtype=idx.dtype)[None, :]
              ).astype(ct.dtype)
        return jnp.dot(oh.T, ct, preferred_element_type=ct.dtype), None

    rows.defvjp(fwd, bwd)
    return rows


cell_tab = jnp.stack([dens, dens * 0.5], axis=1)
alb_tab = jax.random.uniform(jax.random.fold_in(key, 9), (256, 3), F32)


def real_step(sig_scale, steps, use_custom_cell=True, use_rows=True):
    cf = make_cell_fetch() if use_custom_cell else None
    rw = make_rows() if use_rows else None
    dl = dens * sig_scale

    def body(c, ki):
        trans, cr, cg, cb = c
        t_mid = u0 + (ki + 0.5) * dt_u
        flat = jnp.zeros(N, jnp.int32)
        inside_any = jnp.zeros(N, bool)
        for j in range(2):
            lx = (vox[j] + t_mid * vdx[j]) * 64.0
            ly = (vox[j] + t_mid * vdx[j] * 0.9) * 64.0
            lz = (vox[j] + t_mid * vdx[j] * 1.1) * 64.0
            ix = jnp.clip(lx.astype(jnp.int32), 0, 63)
            iy = jnp.clip(ly.astype(jnp.int32), 0, 63)
            iz = jnp.clip(lz.astype(jnp.int32), 0, 63)
            inside = ((lx >= 0.0) & (lx < 64.0) & (ly >= 0.0) & (ly < 64.0)
                      & (lz >= 0.0) & (lz < 64.0))
            f = (ix * 64 + iy) * 64 + iz
            flat = jnp.where(inside & ~inside_any, f, flat)
            inside_any = inside_any | inside
        if use_custom_cell:
            cells = cf(dl, jnp.stack([dl, dl * 0.5], axis=1), flat)
        else:
            cells = jnp.take(jnp.stack([dl, dl * 0.5], axis=1), flat,
                             axis=0, mode="clip")
        s = jnp.where(inside_any, cells[:, 0], 0.0)
        m = cells[:, 1].astype(jnp.int32) & 255
        if use_rows:
            alb = rw(alb_tab, m)
        else:
            alb = jnp.take(alb_tab, m, axis=0, mode="clip")
        alpha = 1.0 - jnp.exp(-s * dt_u)
        wgt = trans * alpha
        cr = cr + wgt * jnp.where(inside_any, alb[:, 0], 0.0)
        cg = cg + wgt * jnp.where(inside_any, alb[:, 1], 0.0)
        cb = cb + wgt * jnp.where(inside_any, alb[:, 2], 0.0)
        return (trans * (1.0 - alpha), cr, cg, cb), None

    init = (jnp.ones(N, F32), jnp.zeros(N, F32), jnp.zeros(N, F32),
            jnp.zeros(N, F32))
    (trans, cr, cg, cb), _ = jax.lax.scan(body, init,
                                          jnp.arange(steps, dtype=F32))
    return jnp.mean(cr + cg + cb)


for nm, kw in (("realstep take+take", dict(use_custom_cell=False,
                                           use_rows=False)),
               ("realstep custom+take", dict(use_custom_cell=True,
                                             use_rows=False)),
               ("realstep custom+pallas", dict(use_custom_cell=True,
                                               use_rows=True))):
    for s in (4, 24):
        timed(f"fwd {nm} steps={s}",
              jax.jit(lambda x, s=s, kw=kw: real_step(x, s, **kw)), 0.5)
        timed(f"grad {nm} steps={s}",
              jax.jit(jax.grad(lambda x, s=s, kw=kw: real_step(x, s, **kw))),
              0.5)

# unrolled python loop instead of lax.scan
def coords_unrolled(sig_scale, steps):
    trans = jnp.ones(N, F32)
    cr = jnp.zeros(N, F32)
    for ki in range(steps):
        t_mid = u0 + (ki + 0.5) * dt_u
        lx = (vox[0] + t_mid * vdx[0]) * 64.0
        inside = (lx >= 0.0) & (lx < 64.0)
        s = jnp.where(inside, sig_scale, 0.0)
        alpha = 1.0 - jnp.exp(-s * dt_u)
        cr = cr + trans * alpha
        trans = trans * (1.0 - alpha)
    return jnp.mean(cr)


for s in (4, 24):
    timed(f"unrolled 1-pair fwd steps={s}",
          jax.jit(lambda x, s=s: coords_unrolled(x, s)), 0.5)
    timed(f"unrolled 1-pair grad steps={s}",
          jax.jit(jax.grad(lambda x, s=s: coords_unrolled(x, s))), 0.5)
