"""Host-side voxel grid construction.

Grids are uint8 arrays of *material indices* with MAT_NONE=255 meaning
empty (reference convention: MatType grid, scene.h:252-258).  `.vox` models
ingest with the reference's axis remap (vox z-up -> renderer y-up) and
palette->material-table mutation (scene.cpp:449-529).
"""

from __future__ import annotations

import numpy as np

from voxtracer.core.types import MAT_NONE
from voxtracer.io.vox import VoxModel


def empty_grid(gridsize: int) -> np.ndarray:
    return np.full((gridsize, gridsize, gridsize), MAT_NONE, dtype=np.uint8)


def solid_grid(gridsize: int, material: int) -> np.ndarray:
    """Reference ResetGrid(type) (scene.cpp:358-361)."""
    return np.full((gridsize, gridsize, gridsize), material, dtype=np.uint8)


def grid_from_vox(
    model: VoxModel,
    gridsize: int,
    material_updates: dict[int, np.ndarray] | None = None,
    column_window: tuple[int, int] | None = None,
    material_override=None,
):
    """Ingest a VoxModel into a gridsize^3 material grid.

    Replicates Scene::LoadModel (scene.cpp:449-529):
      * axis remap vox->renderer: grid[x*sx, z*sy, y*sz] = index
        (note the quirky cross-axis scale factors — sm.y divides by the
        model's size_y but scales the *z* coordinate; kept verbatim);
      * downscale factors only engage when size_x > gridsize;
      * palette index is the material index verbatim; empty (0) skipped;
      * `material_updates`, when a dict is passed, collects the global
        material-table mutations (albedo=palette rgb, roughness=1.0,
        scene.cpp:516-520) for the caller to apply — last writer wins,
        exactly like the reference's shared table.

    `column_window=(columns, thickness)` gives LoadModelPartial's sliding
    column filter (scene.cpp:531-604); `material_override` is a callable
    `(rng) -> material id` for LoadModelRandomMaterials (scene.cpp:606-683).

    Deviation (documented): the reference writes out of bounds when the
    cross-axis scale factors overflow (e.g. teapot.vox into 64^3); we clip
    those voxels instead of corrupting memory.
    """
    grid = empty_grid(gridsize)
    sx, sy, sz = model.size
    sm = np.ones(3, np.float32)
    if sx > gridsize:
        sm = np.array([gridsize / sx, gridsize / sy, gridsize / sz], np.float32)

    occ = np.argwhere(model.grid > 0)
    if occ.size == 0:
        return grid
    x, y, z = occ[:, 0], occ[:, 1], occ[:, 2]
    ci = model.grid[x, y, z].astype(np.int32)

    if column_window is not None:
        columns, thickness = column_window
        keep = (x >= columns - thickness) & (x <= columns + thickness)
        x, y, z, ci = x[keep], y[keep], z[keep], ci[keep]

    gx = (x.astype(np.float32) * sm[0]).astype(np.int32)
    gy = (z.astype(np.float32) * sm[1]).astype(np.int32)
    gz = (y.astype(np.float32) * sm[2]).astype(np.int32)
    inb = (gx < gridsize) & (gy < gridsize) & (gz < gridsize)
    gx, gy, gz, ci = gx[inb], gy[inb], gz[inb], ci[inb]

    if material_override is not None:
        mats = np.asarray([material_override() for _ in range(ci.size)], np.int32)
    else:
        mats = ci

    if material_updates is not None and material_override is None:
        for idx in np.unique(ci):
            material_updates[int(idx)] = model.palette[idx, :3].astype(np.float32)

    grid[gx, gy, gz] = mats.astype(np.uint8)
    return grid


def emissive_sphere(grid: np.ndarray, material: int, radius: float) -> np.ndarray:
    """Reference CreateEmmisiveSphere (scene.cpp:685-711): fill cells within
    `radius` of the grid center."""
    g = grid.shape[0]
    coords = np.arange(g, dtype=np.float32)
    x, y, z = np.meshgrid(coords, coords, coords, indexing="ij")
    c = g / 2.0
    inside = np.sqrt((x - c) ** 2 + (y - c) ** 2 + (z - c) ** 2) < radius
    out = grid.copy()
    out[inside] = material
    return out
