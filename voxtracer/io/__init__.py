from voxtracer.io.vox import VoxModel, load_vox, parse_vox

__all__ = ["VoxModel", "load_vox", "parse_vox"]
