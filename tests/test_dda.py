"""DDA traversal kernel tests: batched JAX kernels vs analytic expectations
and the scalar oracle (SURVEY.md §4 item 2)."""

import numpy as np
import jax
import jax.numpy as jnp

from voxtracer.core.types import MAT_NONE
from voxtracer.kernels import dda


def _mk_grid(g):
    grid = np.full((g, g, g), MAT_NONE, np.int32)
    return grid


def _run_nearest(grid, o, d, t_limit=1e34):
    g = grid.shape[0]
    o = jnp.asarray(o, jnp.float32)
    d = jnp.asarray(d, jnp.float32)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    rd = 1.0 / d
    ds = jnp.signbit(d).astype(jnp.float32)
    n = o.shape[0]
    return dda.dda_nearest(
        jnp.asarray(grid.reshape(-1)), jnp.int32(g), g,
        jnp.zeros(3, jnp.float32), o, d, rd, ds,
        jnp.full(n, t_limit, jnp.float32), jnp.ones(n, bool),
        jnp.int32(1), jnp.int32(0))


def test_axis_ray_hits_first_voxel():
    g = 8
    grid = _mk_grid(g)
    grid[4, :, :] = 3  # solid slab at x-cell 4
    o = np.array([[-0.5, 0.55, 0.55], [1.5, 0.55, 0.55]], np.float32)
    d = np.array([[1.0, 0.0, 0.0], [-1.0, 0.0, 0.0]], np.float32)
    hit, t, cell = _run_nearest(grid, o, d)
    assert bool(hit[0]) and bool(hit[1])
    assert int(cell[0]) == 3 and int(cell[1]) == 3
    # slab front face: x = 4/8 -> t = 0.5 - (-0.5) = 1.0 ; back face x = 5/8
    np.testing.assert_allclose(float(t[0]), 1.0, atol=1e-5)
    np.testing.assert_allclose(float(t[1]), 1.5 - 5.0 / 8.0, atol=1e-5)


def test_miss_empty_grid_and_outside():
    g = 4
    grid = _mk_grid(g)
    o = np.array([[0.5, 0.5, -1.0], [5.0, 5.0, 5.0]], np.float32)
    d = np.array([[0.0, 0.0, 1.0], [0.0, 1.0, 0.0]], np.float32)
    hit, t, cell = _run_nearest(grid, o, d)
    assert not bool(hit[0]) and not bool(hit[1])
    assert int(cell[0]) == MAT_NONE


def test_diagonal_traversal_matches_bruteforce():
    rng = np.random.default_rng(0)
    g = 16
    grid = _mk_grid(g)
    occ = rng.random((g, g, g)) < 0.08
    grid[occ] = 5
    n = 256
    o = (rng.random((n, 3)).astype(np.float32) - 0.5) * 0.2 - np.array([0.6, 0, 0], np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    hit, t, cell = _run_nearest(grid, o, d)
    # brute force: march tiny steps and find first occupied cell
    for i in range(0, n, 17):
        ts = np.arange(0.0, 3.0, 1e-4, dtype=np.float64)
        pts = o[i][None, :] + ts[:, None] * d[i][None, :]
        inside = ((pts >= 0) & (pts < 1)).all(axis=1)
        cells = np.clip((pts * g).astype(int), 0, g - 1)
        occ_mask = inside & (grid[cells[:, 0], cells[:, 1], cells[:, 2]] != MAT_NONE)
        if occ_mask.any():
            t_ref = ts[occ_mask.argmax()]
            assert bool(hit[i]), i
            assert abs(float(t[i]) - t_ref) < 5e-4, (i, float(t[i]), t_ref)
        else:
            assert not bool(hit[i]), i


def test_exit_march_through_material():
    g = 8
    grid = _mk_grid(g)
    grid[2:6, :, :] = 8  # glass block x cells [2,6)
    o = jnp.asarray([[2.5 / 8.0, 0.55, 0.57]], jnp.float32)  # inside glass
    d = jnp.asarray([[1.0, 0.0, 0.0]], jnp.float32)
    rd = 1.0 / d
    ds = jnp.signbit(d).astype(jnp.float32)
    in_vol, t, cell = dda.dda_exit(
        jnp.asarray(grid.reshape(-1)), jnp.int32(g), g, jnp.zeros(3, jnp.float32),
        o, d, rd, ds, jnp.ones(1, bool), jnp.zeros(1, jnp.int32),
        jnp.int32(8), jnp.int32(9), jnp.int32(14))
    assert bool(in_vol[0])  # exits into empty cell inside the grid
    np.testing.assert_allclose(float(t[0]), 6.0 / 8.0 - 2.5 / 8.0, atol=1e-5)
    assert int(cell[0]) == MAT_NONE

    # glass to the grid edge -> falls off, reports boundary t
    grid2 = _mk_grid(g)
    grid2[2:, :, :] = 8
    in_vol2, t2, _ = dda.dda_exit(
        jnp.asarray(grid2.reshape(-1)), jnp.int32(g), g, jnp.zeros(3, jnp.float32),
        o, d, rd, ds, jnp.ones(1, bool), jnp.zeros(1, jnp.int32),
        jnp.int32(8), jnp.int32(9), jnp.int32(14))
    assert not bool(in_vol2[0])
    np.testing.assert_allclose(float(t2[0]), 1.0 - 2.5 / 8.0, atol=1e-5)


def test_occlusion_blocked_and_clear():
    g = 8
    grid = _mk_grid(g)
    grid[:, 3, :] = 9  # smoke slab also occludes (reference quirk)
    o = jnp.asarray([[0.55, -0.5, 0.57], [0.55, -0.5, 0.57]], jnp.float32)
    d = jnp.asarray([[0.0, 1.0, 0.0], [0.0, -1.0, 0.0]], jnp.float32)
    rd = 1.0 / d
    ds = jnp.signbit(d).astype(jnp.float32)
    occ = dda.dda_occluded(
        jnp.asarray(grid.reshape(-1)), jnp.int32(g), g, jnp.zeros(3, jnp.float32),
        o, d, rd, ds, jnp.full(2, 10.0, jnp.float32), jnp.ones(2, bool))
    assert bool(occ[0]) and not bool(occ[1])
    # beyond-the-light hits don't occlude
    occ2 = dda.dda_occluded(
        jnp.asarray(grid.reshape(-1)), jnp.int32(g), g, jnp.zeros(3, jnp.float32),
        o, d, rd, ds, jnp.full(2, 0.6, jnp.float32), jnp.ones(2, bool))
    assert not bool(occ2[0])


def test_normal_voxel_faces():
    g = 8
    fwd = jnp.eye(4, dtype=jnp.float32)
    # ray along +x hits a face at x=0.5: normal should be -x
    o = jnp.asarray([[-0.5, 0.55, 0.55]], jnp.float32)
    d = jnp.asarray([[1.0, 0.0, 0.0]], jnp.float32)
    ds = jnp.signbit(d).astype(jnp.float32)
    n = dda.normal_voxel(jnp.int32(g), fwd, o, d, jnp.asarray([1.0], jnp.float32), ds)
    np.testing.assert_allclose(np.asarray(n)[0], [-1.0, 0.0, 0.0], atol=1e-6)
