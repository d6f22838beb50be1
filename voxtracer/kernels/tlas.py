"""Wavefront stack-based TLAS (BVH) traversal — SURVEY.md §2 #7.

Device counterpart of scene/tlas.py: all rays walk the instance BVH
together with per-lane stacks (fixed depth, masked push/pop — the
wavefront analogue of BasicBVH::IntersectBVH's recursion,
BasicBVH.cpp:47-61).  Produces the per-ray candidate-instance mask that a
compacting traversal would consume; in the dense regime the fused DDA
already slab-tests every pair, so this is the acceleration interface for
future packet compaction (see PERF_NOTES.md)."""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

MAX_STACK = 32


def _slab(nmin, nmax, o, rd):
    """Ray/AABB overlap test; nmin/nmax [N, 3] (gathered per ray)."""
    t0 = (nmin - o) * rd
    t1 = (nmax - o) * rd
    tmin = jnp.minimum(t0, t1).max(axis=-1)
    tmax = jnp.maximum(t0, t1).min(axis=-1)
    return (tmax >= jnp.maximum(tmin, 0.0))


@partial(jax.jit, static_argnames=("n_vol",))
def bvh_candidates(nmin, nmax, left, first, count, order, o, d, n_vol: int):
    """Returns candidates [V, N] bool: instance v may be hit by ray r.

    Stack-based traversal, all rays in lockstep: each iteration pops one
    node per ray, tests its AABB, pushes children or marks leaf instances."""
    n = o.shape[0]
    rd = 1.0 / d

    stack = jnp.zeros((MAX_STACK, n), jnp.int32)
    sp = jnp.ones(n, jnp.int32)  # node 0 pre-pushed
    cand = jnp.zeros((n_vol, n), bool)

    def cond(state):
        _, sp, _, it = state
        return jnp.any(sp > 0) & (it < 4 * n_vol + 64)

    def body(state):
        stack, sp, cand, it = state
        active = sp > 0
        top = jnp.maximum(sp - 1, 0)
        node = jnp.take_along_axis(stack, top[None, :], axis=0)[0]
        sp = jnp.where(active, sp - 1, sp)

        bmin = jnp.take(nmin, node, axis=0)
        bmax = jnp.take(nmax, node, axis=0)
        hit = active & _slab(bmin, bmax, o, rd)

        l = jnp.take(left, node)
        is_leaf = l < 0
        f = jnp.take(first, node)
        c = jnp.take(count, node)

        # leaf: mark up to 2 instances (leaves hold <= 2, scene/tlas.py)
        leaf_hit = hit & is_leaf
        v0 = jnp.take(order, jnp.clip(f, 0, n_vol - 1))
        v1 = jnp.take(order, jnp.clip(f + 1, 0, n_vol - 1))
        vol_ids = jnp.arange(cand.shape[0], dtype=jnp.int32)[:, None]
        mark = (vol_ids == v0[None, :]) & leaf_hit[None, :] & (c[None, :] >= 1)
        mark |= (vol_ids == v1[None, :]) & leaf_hit[None, :] & (c[None, :] >= 2)
        cand = cand | mark

        # internal: push both children (right = left + 1)
        push = hit & ~is_leaf
        idx0 = jnp.minimum(sp, MAX_STACK - 1)
        onehot0 = (jnp.arange(MAX_STACK, dtype=jnp.int32)[:, None] == idx0[None, :])
        stack = jnp.where(onehot0 & push[None, :], l[None, :], stack)
        sp = jnp.where(push, jnp.minimum(sp + 1, MAX_STACK), sp)
        idx1 = jnp.minimum(sp, MAX_STACK - 1)
        onehot1 = (jnp.arange(MAX_STACK, dtype=jnp.int32)[:, None] == idx1[None, :])
        stack = jnp.where(onehot1 & push[None, :], (l + 1)[None, :], stack)
        sp = jnp.where(push, jnp.minimum(sp + 1, MAX_STACK), sp)

        return stack, sp, cand, it + 1

    _, _, cand, _ = jax.lax.while_loop(cond, body, (stack, sp, cand,
                                                    jnp.int32(0)))
    return cand
