"""TLAS BVH tests: world AABBs, build invariants, candidate completeness
(SURVEY.md §2 #7 — the reference's dormant BVH, made real)."""

import numpy as np
import jax.numpy as jnp

from voxtracer.kernels.tlas import bvh_candidates
from voxtracer.scene.instances import VolumeSpec, build_volumes
from voxtracer.scene.tlas import build_tlas, instance_world_aabbs
from voxtracer.scene.volume import solid_grid


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
