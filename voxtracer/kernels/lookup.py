"""Pallas small-table row lookup.

An XLA `jnp.take` of N=2M per-ray indices costs ~5-7 ns/row on this chip
regardless of table size (HBM gather, scripts/probe_scatter.py); inside a
Pallas kernel the same lookup from a VMEM-resident table is a
`tpu.dynamic_gather` lane shuffle at ~0.007-0.08 ns/idx (PERF_NOTES.md).
The 1080p path frame does four such takes PER BOUNCE (material rows, sky,
albedo, cell ids) — together more than half the frame (measured ablation,
round 3).  This kernel serves every table small enough for a where-chain
(K <= ~4096); bigger tables (the sky texture, the voxel grids) stay XLA.

Reference behavior being accelerated: the material-property lookups of
Renderer::Trace (renderer.cpp:1100-1140) — palette/material structs read
per hit point.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from voxtracer.kernels.pallas_dda import _gchain_ref, _on_tpu, _pad_to

F32 = jnp.float32
I32 = jnp.int32


@partial(jax.jit, static_argnames=("interpret",))
def lookup_rows(tab, idx, interpret=None):
    """Row gather `tab[clip(idx)]`: tab [K, C] -> [N, C] float32.

    Drop-in for jnp.take(tab, idx, axis=0, mode="clip") when K fits a
    VMEM where-chain.  Non-TPU backends use the XLA take directly."""
    if interpret is None:
        interpret = not _on_tpu()
    tab = tab.astype(F32)
    if interpret:
        return jnp.take(tab, idx, axis=0, mode="clip")
    k, c = tab.shape
    n = idx.shape[0]
    ix = jnp.clip(idx.astype(I32), 0, k - 1)
    tabp = _pad_to(tab, 128, axis=0)
    nb = tabp.shape[0] // 128
    tab_t = tabp.T.reshape(c, nb, 128)

    blk = 1024
    npad = -(-n // blk) * blk
    nblk = npad // blk
    ix2 = _pad_to(ix, blk).reshape(nblk, 8, 128)

    def kernel(idx_ref, tab_ref, out_ref):
        iv = idx_ref[0]
        for ch in range(c):
            out_ref[0, ch] = _gchain_ref(
                lambda kk, ch=ch: tab_ref[ch, kk], iv, nb)

    out = pl.pallas_call(
        kernel,
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(tab_t.shape, lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, c, 8, 128), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nblk, c, 8, 128), F32),
    )(ix2, tab_t)
    return out.transpose(0, 2, 3, 1).reshape(npad, c)[:n]
