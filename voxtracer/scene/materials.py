"""Default material bank (reference: Renderer::MaterialSetUp,
renderer.cpp:357-443).

256-slot SoA arrays; slots 16..254 are the pad materials the .vox palette
loader mutates (albedo from palette, roughness 1); slot 255 is NONE.
"""

from __future__ import annotations

import numpy as np

from voxtracer.core.types import Materials


def default_materials() -> Materials:
    albedo = np.ones((256, 3), np.float32)
    roughness = np.ones(256, np.float32)
    emissive = np.zeros(256, np.float32)
    ior = np.full(256, 1.5, np.float32)

    smoke_color = np.array([1.0, 0.7, 1.0], np.float32)

    # non-metals 0-4 (renderer.cpp:360-364)
    albedo[0] = (1, 1, 1); roughness[0] = 1.0
    albedo[1] = (1, 0, 0); roughness[1] = 0.6
    albedo[2] = (0, 0, 1); roughness[2] = 0.25
    albedo[3] = (0, 1, 0); roughness[3] = 0.0
    albedo[4] = (1, 0.6, 0.8); roughness[4] = 0.3
    # metals 5-7 (renderer.cpp:367-369)
    albedo[5] = (1, 1, 1); roughness[5] = 1.0
    albedo[6] = (0, 1, 1); roughness[6] = 0.5
    albedo[7] = (0.9, 0.9, 0.9); roughness[7] = 0.01
    # glass 8 (renderer.cpp:371-372)
    albedo[8] = (1, 0.5, 1); roughness[8] = 1.0; ior[8] = 1.45
    # smoke 9-14 (renderer.cpp:375-399)
    for i, strength in zip(range(9, 14), (3.0, 8.0, 12.0, 15.0, 16.0)):
        albedo[i] = smoke_color
        ior[i] = 1.0
        emissive[i] = strength
    albedo[14] = (0, 0, 0); ior[14] = 1.0; emissive[14] = 22.0  # SMOKE_PLAYER
    # emissive 15 (renderer.cpp:401-402)
    albedo[15] = smoke_color; emissive[15] = 5.0
    # 16..254: pad Material((1,1,1), 1) (renderer.cpp:434-442) = array defaults
    # 255: NONE — zero it so accidental lookups contribute nothing
    albedo[255] = 0; roughness[255] = 0; emissive[255] = 0; ior[255] = 1.0

    return Materials(albedo=albedo, roughness=roughness, emissive=emissive, ior=ior)


def apply_palette_updates(materials: Materials, updates: dict[int, np.ndarray]) -> Materials:
    """Apply LoadModel's global material-table mutation (scene.cpp:516-520):
    albedo from palette, roughness forced to 1.  Last load wins."""
    albedo = np.array(materials.albedo)
    roughness = np.array(materials.roughness)
    for idx, rgb in updates.items():
        albedo[idx] = rgb
        roughness[idx] = 1.0
    return materials.replace(albedo=albedo, roughness=roughness)


def randomize_smoke_colors(materials: Materials, rng: np.random.Generator) -> Materials:
    """Reference RandomizeSmokeColors (renderer.cpp:348-355)."""
    albedo = np.array(materials.albedo)
    base = np.array([1.0, 0.7, 1.0], np.float32)
    for i in range(9, 14):  # SMOKE_LOW..SMOKE_HIGH
        albedo[i] = base + np.array(
            [rng.uniform(-0.2, 0.0), rng.uniform(-0.2, 0.2), rng.uniform(-0.1, 0.0)],
            np.float32,
        )
    return materials.replace(albedo=albedo)
