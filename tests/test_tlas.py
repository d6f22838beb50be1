"""TLAS BVH tests: world AABBs, build invariants, candidate completeness
(SURVEY.md §2 #7 — the reference's dormant BVH, made real)."""

import numpy as np
import pytest
import jax.numpy as jnp

from voxtracer.kernels.tlas import bvh_candidates
from voxtracer.scene.instances import VolumeSpec, build_volumes
from voxtracer.scene.tlas import build_tlas, instance_world_aabbs
from voxtracer.scene.volume import solid_grid

# minutes-scale on a 2-vCPU box (interpret-mode Pallas kernels, golden
# renders, multi-second jit compiles): long-lane only, the fast CI gate
# runs `-m 'not slow'` (pyproject.toml marker)
pytestmark = pytest.mark.slow


def _random_scene(n_vol, seed=0):
    rng = np.random.default_rng(seed)
    specs = []
    for _ in range(n_vol):
        specs.append(VolumeSpec(
            position=tuple(rng.uniform(-4, 4, 3)),
            gridsize=1,
            scale=tuple(rng.uniform(0.5, 3.0, 3)),
            rotation=tuple(rng.uniform(0, 1.0, 3)),
            grid=solid_grid(1, 1)))
    return build_volumes(specs)


def test_world_aabbs_contain_transformed_cube():
    vols = _random_scene(5)
    lo, hi = instance_world_aabbs(vols)
    assert (hi >= lo).all()
    # a point at the cube center must be inside the AABB
    for i in range(5):
        c_obj = np.asarray(vols.cube_min[i]) + 0.5
        m = np.asarray(vols.fwd[i])
        c_world = m[:3, :3] @ c_obj + m[:3, 3]
        assert (c_world >= lo[i] - 1e-4).all() and (c_world <= hi[i] + 1e-4).all()


def test_bvh_build_invariants():
    vols = _random_scene(9, seed=2)
    lo, hi = instance_world_aabbs(vols)
    bvh = build_tlas(lo, hi)
    order = bvh["order"]
    assert sorted(order.tolist()) == list(range(9))
    # every leaf has <= 2 instances and its bounds contain them
    for node in range(len(bvh["left"])):
        if bvh["left"][node] < 0:
            f, c = bvh["first"][node], bvh["count"][node]
            assert 1 <= c <= 2
            idx = order[f:f + c]
            assert (bvh["nmin"][node] <= lo[idx] + 1e-6).all()
            assert (bvh["nmax"][node] >= hi[idx] - 1e-6).all()


def test_candidates_superset_of_bruteforce_hits():
    vols = _random_scene(9, seed=3)
    lo, hi = instance_world_aabbs(vols)
    bvh = build_tlas(lo, hi)
    rng = np.random.default_rng(4)
    n = 128
    o = rng.uniform(-8, 8, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)

    cand = np.asarray(bvh_candidates(
        jnp.asarray(bvh["nmin"]), jnp.asarray(bvh["nmax"]),
        jnp.asarray(bvh["left"]), jnp.asarray(bvh["first"]),
        jnp.asarray(bvh["count"]), jnp.asarray(bvh["order"]),
        jnp.asarray(o), jnp.asarray(d), 9))

    # brute-force exact AABB hits must be a subset of the BVH candidates
    for i in range(n):
        rd = 1.0 / d[i]
        t0 = (lo - o[i]) * rd
        t1 = (hi - o[i]) * rd
        tmin = np.minimum(t0, t1).max(axis=-1)
        tmax = np.maximum(t0, t1).min(axis=-1)
        exact = tmax >= np.maximum(tmin, 0.0)
        assert (exact <= cand[:, i]).all(), i


def test_bvh_culled_traversal_bit_identical():
    """VERDICT item 3 'done' criterion: TLAS-pruned candidates feeding the
    traversal produce BIT-IDENTICAL results to the dense all-pairs path on
    the multi-instance city scene (the BVH mask is a sound superset of the
    object-space slab test)."""
    import jax
    import jax.numpy as jnp

    from voxtracer.kernels import dda_occ
    from voxtracer.kernels.tlas import bvh_candidates
    from voxtracer.render.camera import primary_rays
    from voxtracer.render.integrator import _pixel_grid, _vol_args
    from voxtracer.scene import presets

    scene, cfg = presets.city_path(width=24, height=24, gridsize=64,
                                   nx=4, nz=4, bounces=2)
    scene = jax.tree.map(jnp.asarray, scene)
    v = scene.volumes
    px, py = _pixel_grid(cfg)
    o, d = primary_rays(scene.camera, cfg.width, cfg.height, px, py, None, jnp)
    n = o.shape[0]
    act = jnp.ones(n, bool)
    tl = jnp.full(n, 1e34, jnp.float32)
    ven = jnp.ones(v.n, bool)
    kw = dict(occ=v.occ, bricksize=v.bricksize)

    cand = bvh_candidates(v.tlas_nmin, v.tlas_nmax, v.tlas_left,
                          v.tlas_first, v.tlas_count, v.tlas_order,
                          o, d, v.n)
    assert 0 < float(jnp.mean(cand)) < 1.0  # the BVH actually prunes

    dense = dda_occ.traverse_occ_topk(*_vol_args(scene), o, d, tl, act, ven,
                                      **kw, mode="nearest", k=4)
    culled = dda_occ.traverse_occ_topk(*_vol_args(scene), o, d, tl, act, ven,
                                       **kw, mode="nearest", k=4,
                                       cand_mask=cand)
    for f in ("hit", "t", "cell", "vol", "nx", "ny", "nz"):
        np.testing.assert_array_equal(np.asarray(dense[f]),
                                      np.asarray(culled[f]), err_msg=f)

    # and through the Pallas kernel (interpret mode)
    from voxtracer.kernels.pallas_dda import traverse_pallas

    pal = traverse_pallas(*_vol_args(scene), o, d, tl, act, ven, **kw,
                          mode="nearest", interpret=True, cand_mask=cand)
    for f in ("hit", "cell", "vol"):
        np.testing.assert_array_equal(np.asarray(dense[f]),
                                      np.asarray(pal[f]), err_msg=f)
    h = np.asarray(dense["hit"])
    np.testing.assert_allclose(np.asarray(dense["t"])[h],
                               np.asarray(pal["t"])[h], rtol=1e-6, atol=1e-6)
