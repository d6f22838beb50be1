"""Procedural generation tests (SURVEY.md §2 #5)."""

import numpy as np

from voxtracer.core.types import MAT_NONE, SMOKE_HIGH_DENSITY, SMOKE_LOW_DENSITY
from voxtracer.scene.procgen import generate_noise_grid, generate_smoke_grid, perlin3


def test_perlin_range_and_determinism():
    a = perlin3((16, 16, 16), 0.05, seed=1)
    b = perlin3((16, 16, 16), 0.05, seed=1)
    c = perlin3((16, 16, 16), 0.05, seed=2)
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c)
    assert a.min() >= -1.6 and a.max() <= 1.6  # gradient noise bounds-ish
    assert a.std() > 0.05  # actually varies


def test_noise_grid_materials():
    g = generate_noise_grid(32, 0.03, seed=0)
    vals = np.unique(g)
    assert MAT_NONE in vals
    assert (g != MAT_NONE).any()
    # only legal material bands appear
    legal = set(range(0, 16)) | {MAT_NONE}
    assert set(int(v) for v in vals) <= legal


def test_smoke_grid_is_smoke_only_ellipsoid():
    g = generate_smoke_grid(32, 0.167, seed=0)
    vals = set(int(v) for v in np.unique(g))
    assert vals <= set(range(SMOKE_LOW_DENSITY, SMOKE_HIGH_DENSITY + 1)) | {MAT_NONE}
    assert (g != MAT_NONE).sum() > 50  # some smoke exists
    # corners empty (outside the ellipsoid)
    assert g[0, 0, 0] == MAT_NONE and g[-1, -1, -1] == MAT_NONE
