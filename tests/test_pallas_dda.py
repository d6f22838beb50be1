"""Parity: Pallas VMEM-resident traversal (kernels/pallas_dda.py) vs the
XLA occupancy traversal (kernels/dda_occ.py).  Runs the kernel in
interpreter mode on the CPU mesh; numerical semantics are identical so the
comparison is exact on hit/cell/vol and tight on t/normals."""

import numpy as np
import jax.numpy as jnp
import pytest

from voxtracer.kernels import dda, dda_occ
from voxtracer.kernels.pallas_dda import traverse_pallas
from tests.test_dda_occ import _args, _rand_rays, _rand_scene

# minutes-scale on a 2-vCPU box (interpret-mode Pallas kernels, golden
# renders, multi-second jit compiles): long-lane only, the fast CI gate
# runs `-m 'not slow'` (pyproject.toml marker)
pytestmark = pytest.mark.slow

N = 384  # padded to 1 block of 16x128 inside the kernel


@pytest.mark.parametrize("seed,nvol", [(0, 1), (1, 3), (2, 4)])
def test_nearest_parity(seed, nvol):
    rng = np.random.default_rng(seed)
    vols = _rand_scene(rng, nvol=nvol)
    o, d = _rand_rays(rng, n=N)
    n = o.shape[0]
    act = jnp.ones(n, bool)
    tl = jnp.full(n, dda.BIG, jnp.float32)
    ven = jnp.ones(vols.n, bool)
    kw = dict(occ=jnp.asarray(vols.occ),
              bricksize=jnp.asarray(vols.bricksize))

    ref = dda_occ.traverse_occ(*_args(vols), o, d, tl, act, ven, **kw,
                               mode="nearest")
    new = traverse_pallas(*_args(vols), o, d, tl, act, ven, **kw,
                          mode="nearest", interpret=True)
    np.testing.assert_array_equal(np.asarray(ref["hit"]),
                                  np.asarray(new["hit"]))
    h = np.asarray(ref["hit"])
    np.testing.assert_allclose(np.asarray(ref["t"])[h],
                               np.asarray(new["t"])[h], rtol=1e-6, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(ref["cell"])[h],
                                  np.asarray(new["cell"])[h])
    np.testing.assert_array_equal(np.asarray(ref["vol"])[h],
                                  np.asarray(new["vol"])[h])
    for c in ("nx", "ny", "nz"):
        np.testing.assert_allclose(np.asarray(ref[c])[h],
                                   np.asarray(new[c])[h],
                                   rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("seed", [3, 4])
def test_occluded_parity(seed):
    rng = np.random.default_rng(seed)
    vols = _rand_scene(rng, nvol=3)
    o, d = _rand_rays(rng, n=N)
    n = o.shape[0]
    act = jnp.ones(n, bool)
    tl = jnp.asarray(rng.uniform(0.5, 4.0, n).astype(np.float32))
    ven = jnp.ones(vols.n, bool)
    kw = dict(occ=jnp.asarray(vols.occ),
              bricksize=jnp.asarray(vols.bricksize))

    ref = dda_occ.traverse_occ(*_args(vols), o, d, tl, act, ven, **kw,
                               mode="occluded")
    new = traverse_pallas(*_args(vols), o, d, tl, act, ven, **kw,
                          mode="occluded", interpret=True)
    np.testing.assert_array_equal(np.asarray(ref["hit"]),
                                  np.asarray(new["hit"]))


def test_inactive_and_disabled():
    """Inactive rays stay misses; disabled volumes are never hit."""
    rng = np.random.default_rng(9)
    vols = _rand_scene(rng, nvol=3)
    o, d = _rand_rays(rng, n=N)
    n = o.shape[0]
    act = jnp.asarray(rng.integers(0, 2, n).astype(bool))
    tl = jnp.full(n, dda.BIG, jnp.float32)
    ven = jnp.asarray([True, False, True])
    kw = dict(occ=jnp.asarray(vols.occ),
              bricksize=jnp.asarray(vols.bricksize))

    ref = dda_occ.traverse_occ(*_args(vols), o, d, tl, act, ven, **kw,
                               mode="nearest")
    new = traverse_pallas(*_args(vols), o, d, tl, act, ven, **kw,
                          mode="nearest", interpret=True)
    np.testing.assert_array_equal(np.asarray(ref["hit"]),
                                  np.asarray(new["hit"]))
    assert not np.any(np.asarray(new["hit"]) & ~np.asarray(act))
    assert not np.any(np.asarray(new["vol"]) == 1)
    h = np.asarray(ref["hit"])
    np.testing.assert_array_equal(np.asarray(ref["vol"])[h],
                                  np.asarray(new["vol"])[h])


@pytest.mark.parametrize("seed", [5, 6])
def test_exit_parity(seed):
    from voxtracer.kernels.pallas_dda import exit_pallas

    rng = np.random.default_rng(seed)
    vols = _rand_scene(rng, nvol=3)
    o, d = _rand_rays(rng, n=256)
    o = o * 0.4  # origins near volume interiors
    n = o.shape[0]
    vol_idx = jnp.asarray(rng.integers(0, vols.n, n).astype(np.int32))
    mode_code = jnp.asarray(rng.integers(0, 2, n).astype(np.int32))
    mask = jnp.ones(n, bool)
    kw = dict(occ=jnp.asarray(vols.occ),
              bricksize=jnp.asarray(vols.bricksize))

    ref = dda_occ.traverse_occ(*_args(vols), o, d,
                               jnp.full(n, dda.BIG, jnp.float32), mask,
                               jnp.ones(vols.n, bool), **kw,
                               mode="exit", mode_code=mode_code,
                               vol_match=vol_idx)
    new = exit_pallas(*_args(vols), o, d, mask, mode_code, vol_idx, **kw,
                      interpret=True)
    np.testing.assert_array_equal(np.asarray(ref["in_vol"]),
                                  np.asarray(new["in_vol"]))
    np.testing.assert_allclose(np.asarray(ref["t"]), np.asarray(new["t"]),
                               rtol=1e-6, atol=1e-6)
    iv = np.asarray(ref["in_vol"])
    np.testing.assert_array_equal(np.asarray(ref["cell"])[iv],
                                  np.asarray(new["cell"])[iv])
    for c in ("nx", "ny", "nz"):
        np.testing.assert_allclose(np.asarray(ref[c])[iv],
                                   np.asarray(new[c])[iv],
                                   rtol=1e-5, atol=1e-5)


def test_compact_descend_parity():
    """The host-compacted occupied-brick tables (occ_slot/occ_rows0) give
    bit-identical results to the dense identity slot map."""
    rng = np.random.default_rng(12)
    vols = _rand_scene(rng, nvol=3)
    o, d = _rand_rays(rng, n=N)
    n = o.shape[0]
    act = jnp.ones(n, bool)
    tl = jnp.full(n, dda.BIG, jnp.float32)
    ven = jnp.ones(vols.n, bool)
    kw = dict(occ=jnp.asarray(vols.occ),
              bricksize=jnp.asarray(vols.bricksize))

    dense = traverse_pallas(*_args(vols), o, d, tl, act, ven, **kw,
                            mode="nearest", interpret=True)
    comp = traverse_pallas(*_args(vols), o, d, tl, act, ven, **kw,
                           mode="nearest", interpret=True,
                           occ_slot=jnp.asarray(vols.occ_slot),
                           occ_rows0=jnp.asarray(vols.occ_rows0))
    for f in ("hit", "t", "cell", "vol", "nx", "ny", "nz"):
        np.testing.assert_array_equal(np.asarray(dense[f]),
                                      np.asarray(comp[f]), err_msg=f)


@pytest.mark.parametrize("seed,nvol", [(5, 3), (6, 4)])
def test_nearest_palette_parity(seed, nvol):
    """In-kernel palette material fetch == XLA take(grids_flat, gidx)
    (pal/pal_rows0 from scene/instances.py build_palette_rows)."""
    rng = np.random.default_rng(seed)
    vols = _rand_scene(rng, nvol=nvol)
    assert vols.pal is not None
    o, d = _rand_rays(rng, n=N)
    n = o.shape[0]
    act = jnp.ones(n, bool)
    tl = jnp.full(n, dda.BIG, jnp.float32)
    ven = jnp.ones(vols.n, bool)
    kw = dict(occ=jnp.asarray(vols.occ),
              bricksize=jnp.asarray(vols.bricksize))

    comp = dict(occ_slot=jnp.asarray(vols.occ_slot),
                occ_rows0=jnp.asarray(vols.occ_rows0))
    ref = traverse_pallas(*_args(vols), o, d, tl, act, ven, **kw, **comp,
                          mode="nearest", interpret=True)
    new = traverse_pallas(*_args(vols), o, d, tl, act, ven, **kw, **comp,
                          mode="nearest", interpret=True,
                          pal=jnp.asarray(vols.pal),
                          pal_rows0=jnp.asarray(vols.pal_rows0))
    np.testing.assert_array_equal(np.asarray(ref["hit"]),
                                  np.asarray(new["hit"]))
    np.testing.assert_array_equal(np.asarray(ref["cell"]),
                                  np.asarray(new["cell"]))
    np.testing.assert_array_equal(np.asarray(ref["vol"]),
                                  np.asarray(new["vol"]))
