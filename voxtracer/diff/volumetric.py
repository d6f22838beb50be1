"""Differentiable (relaxed) voxel rendering — the adjoint-capable twin of the
hard DDA renderer.

The hard forward (kernels/dda.py) is piecewise-constant in voxel occupancy:
first-hit geometry has zero/undefined gradients (SURVEY.md §7 "adjoint of a
discrete traversal").  This module renders the SAME voxel worlds through an
exp-transmittance ray march:

    T_k = exp(-sum_{j<k} sigma_j dt),  C = sum_k T_k (1-exp(-sigma_k dt)) c_k
          + T_final * background

with sigma = softplus(density_logits) * scale.  As scale -> inf and logits
saturate, C converges to the hard primary-hit image — golden tests check
that consistency.  Gradients flow to per-voxel density logits AND the
256-entry material albedo table (the differentiable parameter set of
BASELINE.json).

The bounce/shading path of the hard renderer is separately differentiable
w.r.t. material parameters (traversal outputs are stop_gradient'ed there);
this module supplies the geometry gradients the reference never had.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from flax import struct

from voxtracer.core.types import MAT_NONE, SceneData
from voxtracer.render.sky import sample_sky

F32 = jnp.float32

# rematerialize the march in backward: ~2x HBM savings for ~1 extra forward
# of compute.  At bench band sizes the stored-activation variant fits HBM;
# toggled off there (scripts/bench_bwd.py measures the tradeoff).
_REMAT = True


@struct.dataclass
class DiffParams:
    """The trainable leaves."""

    density_logits: jnp.ndarray  # [V, G, G, G] f32
    albedo_table: jnp.ndarray  # [256, 3] f32


def params_from_scene(scene: SceneData, occupied_logit=6.0, empty_logit=-6.0) -> DiffParams:
    occ = scene.volumes.grids != MAT_NONE
    logits = jnp.where(occ, occupied_logit, empty_logit).astype(F32)
    return DiffParams(density_logits=logits,
                      albedo_table=jnp.asarray(scene.materials.albedo, F32))


@jax.custom_vjp
def _rows(table, idx):
    """Row gather whose table-cotangent uses the MXU instead of scatter.

    The natural adjoint of take(axis=0) into a tiny [256, 3] table is a
    scatter-add with ~100% index collisions (~9 ns/row measured); the
    one-hot matmul accumulation costs ~2.5 ns/row and is exact in f32."""
    return jnp.take(table, idx, axis=0, mode="clip")


def _rows_fwd(table, idx):
    return _rows(table, idx), (idx, table.shape[0])


def _rows_bwd(res, ct):
    idx, t = res
    oh = (idx[:, None] == jnp.arange(t, dtype=idx.dtype)[None, :]).astype(ct.dtype)
    return jnp.dot(oh.T, ct, preferred_element_type=ct.dtype), None


_rows.defvjp(_rows_fwd, _rows_bwd)


@jax.custom_vjp
def _cell_fetch(dens_flat, cell_tab, idx):
    """[T,2] row gather (density, material) whose density-adjoint is a 1-D
    scatter: a [N,2]-row scatter-add costs 41 ns/row on this chip, the 1-D
    scalar scatter 7.5 ns (PERF_NOTES.md); the material column never needs
    a gradient."""
    return jnp.take(cell_tab, idx, axis=0, mode="clip")


def _cell_fetch_fwd(dens_flat, cell_tab, idx):
    return _cell_fetch(dens_flat, cell_tab, idx), (idx, dens_flat.shape[0])


def _cell_fetch_bwd(res, ct):
    idx, t = res
    ci = jnp.clip(idx, 0, t - 1)
    d_dens = jnp.zeros((t,), ct.dtype).at[ci].add(ct[:, 0])
    return d_dens, None, None


_cell_fetch.defvjp(_cell_fetch_fwd, _cell_fetch_bwd)


def _ray_aabb(cube_min, o, d):
    """Entry/exit of the object-space unit cube; (t0, t1) with t0<t1 if hit."""
    rd = 1.0 / d
    a = (cube_min - o) * rd
    b = (cube_min + 1.0 - o) * rd
    tmin = jnp.minimum(a, b).max(axis=-1)
    tmax = jnp.maximum(a, b).min(axis=-1)
    t0 = jnp.maximum(tmin, 0.0)
    return t0, tmax, tmax > t0


@partial(jax.jit, static_argnames=("n_steps", "cfg", "rows", "k"))
def render_diff(params: DiffParams, scene: SceneData, cfg, key, n_steps: int = 192,
                density_scale: float = 512.0, row0=None, rows: int = 0,
                k: int = 0):
    """Primary-visibility differentiable render -> [H, W, 3] (or
    [rows, W, 3] when a row band is given — used to bound memory at 1080p).

    Each ray x volume pair marches its own AABB interval with n_steps
    samples; segments composite front-to-back by entry t (exact for
    instance AABBs disjoint along the ray, entry-ordered approximation
    for overlaps).

    k > 0 compacts pairs to the k earliest-entry volumes per ray (march
    cost — gathers AND gradient scatters — scales with pairs).  EXACT only
    when no ray crosses more than k instance AABBs; callers verify that on
    the host (cheap slab tests) and fall back to k=0 (dense)."""
    from voxtracer.render.camera import primary_rays
    from voxtracer.render.integrator import _pixel_grid

    if rows:
        x = jnp.arange(cfg.width, dtype=F32)
        y = jnp.arange(rows, dtype=F32) + row0
        px, py = jnp.meshgrid(x, y)
        px, py = px.reshape(-1), py.reshape(-1)
    else:
        px, py = _pixel_grid(cfg)
    o, d = primary_rays(scene.camera, cfg.width, cfg.height, px, py, None, jnp)
    n = o.shape[0]
    v = scene.volumes.n
    g = scene.volumes.pad_size

    # SoA component layout throughout the march (PERF_NOTES.md: trailing
    # dim 3 wastes the VPU) + fused per-step gather over all volumes.
    inv = scene.volumes.inv  # [V, 4, 4]

    def tr(row, px_, py_, pz_, point):
        c = row[:, None, :]
        out = c[..., 0] * px_ + c[..., 1] * py_ + c[..., 2] * pz_
        return out + c[..., 3] if point else out

    ox, oy, oz = o[:, 0], o[:, 1], o[:, 2]
    dx, dy, dz = d[:, 0], d[:, 1], d[:, 2]
    vox = tr(inv[:, 0], ox, oy, oz, True)   # [V, N]
    voy = tr(inv[:, 1], ox, oy, oz, True)
    voz = tr(inv[:, 2], ox, oy, oz, True)
    vdx = tr(inv[:, 0], dx, dy, dz, False)
    vdy = tr(inv[:, 1], dx, dy, dz, False)
    vdz = tr(inv[:, 2], dx, dy, dz, False)

    cb = scene.volumes.cube_min  # [V, 3]
    bx, by, bz = cb[:, 0][:, None], cb[:, 1][:, None], cb[:, 2][:, None]

    def slab(b0, oc, dc):
        rd = 1.0 / dc
        a = (b0 - oc) * rd
        b = (b0 + 1.0 - oc) * rd
        return jnp.minimum(a, b), jnp.maximum(a, b)

    t0x, t1x = slab(bx, vox, vdx)
    t0y, t1y = slab(by, voy, vdy)
    t0z, t1z = slab(bz, voz, vdz)
    t0 = jnp.maximum(jnp.maximum(t0x, t0y), jnp.maximum(t0z, 0.0))
    t1 = jnp.minimum(jnp.minimum(t1x, t1y), t1z)
    hit = t1 > t0

    # Each pair marches its OWN [t0, t1] interval (n_steps samples per
    # volume crossing, not per union span): 6-10x finer effective sampling
    # for the same gather/scatter traffic, and rays wasting steps in the
    # gaps between instance AABBs vanish.  Volumes composite front-to-back
    # by entry t after the march (exact for AABBs disjoint along the ray —
    # overlap interleaving is approximated by entry order).
    valid = jnp.any(hit, axis=0)  # [N]

    gs_f = scene.volumes.gridsize.astype(F32)[:, None]  # [V, 1]
    gs_i = scene.volumes.gridsize[:, None]

    if k and k < v:
        # pair compaction: keep the k earliest-entry volumes per ray
        key_t = jnp.where(hit & ~jnp.isnan(t0), t0, 1e30)
        ids = jnp.broadcast_to(jnp.arange(v, dtype=jnp.int32)[:, None], (v, n))
        key_s, t1_s, hit_s, vid = jax.lax.sort(
            (key_t, jnp.where(hit, t1, 0.0), hit, ids), dimension=0,
            num_keys=1)
        t0 = key_s[:k]
        t1 = t1_s[:k]
        hit = hit_s[:k]
        vid = vid[:k]  # [k, N]
        # per-pair volume constants (one [V,16] row gather per pair)
        vtab = jnp.concatenate([
            inv[:, :3, :].reshape(v, 12), cb,
            scene.volumes.gridsize.astype(F32)[:, None]], axis=1)
        rows16 = jnp.take(vtab, vid.reshape(-1), axis=0,
                          mode="clip").reshape(k, n, 16)
        iv = [rows16[..., i] for i in range(12)]
        bx, by, bz = rows16[..., 12], rows16[..., 13], rows16[..., 14]
        gs_f = rows16[..., 15]
        gs_i = gs_f.astype(jnp.int32)
        ox, oy, oz = o[:, 0], o[:, 1], o[:, 2]
        dx, dy, dz = d[:, 0], d[:, 1], d[:, 2]
        vox = iv[0] * ox + iv[1] * oy + iv[2] * oz + iv[3]
        voy = iv[4] * ox + iv[5] * oy + iv[6] * oz + iv[7]
        voz = iv[8] * ox + iv[9] * oy + iv[10] * oz + iv[11]
        vdx = iv[0] * dx + iv[1] * dy + iv[2] * dz
        vdy = iv[4] * dx + iv[5] * dy + iv[6] * dz
        vdz = iv[8] * dx + iv[9] * dy + iv[10] * dz
        vbase = vid * (g * g * g)
        v_eff = k
    else:
        vbase = (jnp.arange(v, dtype=jnp.int32) * g * g * g)[:, None]
        v_eff = v

    t0p = jnp.where(hit, t0, 0.0)  # [v_eff, N]
    dt = jnp.where(hit, (t1 - t0) / n_steps, 0.0)  # [v_eff, N]
    dens_flat = (jax.nn.softplus(params.density_logits).reshape(-1)
                 * density_scale)  # [V * G^3]
    # fuse per-cell fetches into ONE 2-D row gather: a [T, 2] row costs
    # ~2.6 ns total vs 2 x 7.2 ns for 1-D takes (PERF_NOTES.md); column 0
    # carries the differentiable density, column 1 the material id (f32 —
    # exact for ids <= 255).  The VJP scatters rows back into the stack
    # and the material column's cotangent is discarded by the slice.
    cell_tab = jax.lax.stop_gradient(jnp.stack(
        [dens_flat, scene.volumes.grids.reshape(-1).astype(F32)], axis=1))
    # albedo as one [256, 3] row gather instead of 3 channel takes
    alb_tab = params.albedo_table  # [256, 3]

    def step(carry, ki):
        trans, cr, cg_, cb_ = carry  # all [V, N]
        t_mid = t0p + (ki + 0.5) * dt  # [V, N]
        lx = (vox + t_mid * vdx - bx) * gs_f
        ly = (voy + t_mid * vdy - by) * gs_f
        lz = (voz + t_mid * vdz - bz) * gs_f
        ix = jnp.clip(lx.astype(jnp.int32), 0, gs_i - 1)
        iy = jnp.clip(ly.astype(jnp.int32), 0, gs_i - 1)
        iz = jnp.clip(lz.astype(jnp.int32), 0, gs_i - 1)
        inside = ((lx >= 0.0) & (lx < gs_f) & (ly >= 0.0) & (ly < gs_f)
                  & (lz >= 0.0) & (lz < gs_f))
        flat = (ix * g + iy) * g + iz + vbase
        cells = _cell_fetch(dens_flat, cell_tab, flat.reshape(-1))
        s = jnp.where(inside, cells[:, 0].reshape(v_eff, n), 0.0)
        m = cells[:, 1].reshape(v_eff, n).astype(jnp.int32)
        alb = _rows(alb_tab, m.reshape(-1))
        alpha = 1.0 - jnp.exp(-s * dt)  # [V, N]
        wgt = trans * alpha
        cr = cr + wgt * alb[:, 0].reshape(v_eff, n)
        cg_ = cg_ + wgt * alb[:, 1].reshape(v_eff, n)
        cb_ = cb_ + wgt * alb[:, 2].reshape(v_eff, n)
        trans = trans * (1.0 - alpha)
        return (trans, cr, cg_, cb_), None

    init = (jnp.ones((v_eff, n), F32), jnp.zeros((v_eff, n), F32),
            jnp.zeros((v_eff, n), F32), jnp.zeros((v_eff, n), F32))
    step_fn = jax.checkpoint(step) if _REMAT else step
    (trans, cr, cg_, cb_), _ = jax.lax.scan(
        step_fn, init, jnp.arange(n_steps, dtype=F32))

    # composite per-pair segments front-to-back by entry t (no sort: the
    # prefix transmittance of segment v is the product over segments that
    # start strictly earlier, index-ordered on ties)
    order = t0p + jnp.where(hit, 0.0, 1e30)
    idx_v = jnp.arange(v_eff)[:, None]
    out_r = jnp.zeros(n, F32)
    out_g = jnp.zeros(n, F32)
    out_b = jnp.zeros(n, F32)
    for vi in range(v_eff):
        before = ((order[vi] > order)
                  | ((order[vi] == order) & (vi > idx_v)))  # [V, N]
        pf = jnp.prod(jnp.where(before, trans, 1.0), axis=0)  # [N]
        out_r = out_r + pf * cr[vi]
        out_g = out_g + pf * cg_[vi]
        out_b = out_b + pf * cb_[vi]
    t_total = jnp.prod(trans, axis=0)
    color = jnp.stack([out_r, out_g, out_b], axis=-1)

    bg = sample_sky(scene.sky, d, cfg.activate_sky, cfg.sky_fallback)
    img = color + t_total[:, None] * bg
    img = jnp.where(valid[:, None], img, bg)
    return img.reshape(rows or cfg.height, cfg.width, 3)


def mse_loss(params: DiffParams, scene: SceneData, cfg, target, key,
             n_steps: int = 192, row0=None, rows: int = 0, k: int = 0):
    img = render_diff(params, scene, cfg, key, n_steps, row0=row0, rows=rows,
                      k=k)
    return jnp.mean((img - target) ** 2)


grad_fn = jax.jit(jax.grad(mse_loss),
                  static_argnames=("cfg", "n_steps", "rows", "k"))


def max_aabb_crossings(scene: SceneData, cfg, row0: int = 0,
                       rows: int = 0) -> int:
    """HOST-side: the maximum number of instance AABBs any primary ray of
    this camera/band crosses — the smallest exact `k` for render_diff's
    pair compaction (cheap NumPy slab tests, no device work)."""
    import numpy as np

    from voxtracer.render.camera import primary_rays

    h = rows or cfg.height
    x = np.arange(cfg.width, dtype=np.float32)
    y = np.arange(h, dtype=np.float32) + row0
    px, py = np.meshgrid(x, y)
    cam = jax.tree.map(np.asarray, scene.camera)
    o, d = primary_rays(cam, cfg.width, cfg.height, px.reshape(-1),
                        py.reshape(-1), None, np)
    inv = np.asarray(scene.volumes.inv)
    cb = np.asarray(scene.volumes.cube_min)
    count = np.zeros(o.shape[0], np.int32)
    for i in range(inv.shape[0]):
        oo = o @ inv[i, :3, :3].T + inv[i, :3, 3]
        dd = d @ inv[i, :3, :3].T
        with np.errstate(divide="ignore", invalid="ignore"):
            rd = 1.0 / dd
            a = (cb[i] - oo) * rd
            b = (cb[i] + 1.0 - oo) * rd
        t0 = np.maximum(np.nanmax(np.minimum(a, b), axis=1), 0.0)
        t1 = np.nanmin(np.maximum(a, b), axis=1)
        count += (t1 > t0).astype(np.int32)
    return int(count.max())
