#!/usr/bin/env python
"""Probe Mosaic/Pallas primitives on the attached TPU — the measurements
that decide the round-2 traversal kernel design (VERDICT.md item 1 demands
Pallas-vs-XLA be MEASURED, not asserted).

Timing discipline (PERF_NOTES.md + this round's findings):
  * block_until_ready does NOT block through the axon tunnel — every probe
    pulls a reduced scalar to the host.
  * every kernel takes its iteration count as a DEVICE argument; cost is
    (t(2k) - t(k)) / k, which cancels the dispatch/pull constant exactly.

Questions answered (results land in PERF_NOTES.md):
  P1  jnp.take_along_axis -> tpu.dynamic_gather, form-2 (lane gather from a
      128-entry row table): lowers for i32 (yes) — cost per index?
  P2  form-1 (sublane gather): only S=8 lowers — cost?
  P3  16-block where-chain gather from a 2048-row table — cost?
  P4  VPU op mix throughput inside a pallas fori_loop
  X1  XLA 2-D row-gather baseline re-measured with honest timing
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def log(*a):
    print(*a, flush=True)


def _pull(out):
    return np.asarray(jnp.sum(jax.tree.leaves(out)[0]).astype(jnp.float32))


def timed(fn, *args, reps=7):
    _pull(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _pull(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def diff_cost(fn, k, *args, unit_work=1):
    """(t(2k)-t(k)) / (k*unit_work) in ns — dispatch constant cancels."""
    t1 = timed(fn, jnp.int32(k), *args)
    t2 = timed(fn, jnp.int32(2 * k), *args)
    return (t2 - t1) / (k * unit_work) * 1e9, t1, t2


# ---------------------------------------------------------------- X1
def x1_row_gather(n=1 << 20, T=2048, W=16):
    tab = jnp.asarray(np.random.randint(0, 2 ** 20, (T, W)), jnp.int32)
    idx = jnp.asarray(np.random.randint(0, T, (n,)), jnp.int32)

    @jax.jit
    def run(iters, tab, idx):
        def body(i, acc):
            rows = jnp.take(tab, (idx + acc) & (T - 1), axis=0)
            return acc + rows[:, 0] + rows[:, 15]
        return jax.lax.fori_loop(0, iters, body,
                                 jnp.zeros((n,), jnp.int32)).sum()

    ns, t1, t2 = diff_cost(run, 8, tab, idx, unit_work=n)
    log(f"X1 XLA row-gather [{T},{W}]: {ns:.3f} ns/row  "
        f"(t1={t1*1e3:.1f} ms, t2={t2*1e3:.1f} ms)")


# ---------------------------------------------------------------- P1
def p1_lane_gather(B=256):
    """Per-lane gather from a 128-entry table broadcast across rows."""

    def kernel(it_ref, tab_ref, idx_ref, out_ref):
        tab = tab_ref[...]

        def body(i, carry):
            idx, acc = carry
            idx = (idx + acc) & 127
            v = jnp.take_along_axis(tab, idx, axis=1)
            return (idx, acc + v)

        _, acc = jax.lax.fori_loop(
            0, it_ref[0], body,
            (idx_ref[...], jnp.zeros((B, 128), jnp.int32)))
        out_ref[...] = acc

    @jax.jit
    def run(iters, tab, idx):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((B, 128), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(jnp.reshape(iters, (1,)), tab, idx)

    tab = jnp.broadcast_to(jnp.arange(128, dtype=jnp.int32)[None, :],
                           (B, 128))
    idx = jnp.asarray(np.random.randint(0, 128, (B, 128)), jnp.int32)
    try:
        ns, t1, t2 = diff_cost(run, 4096, tab, idx, unit_work=B * 128)
        log(f"P1 lane-gather form-2 i32 [B={B}]: {ns:.4f} ns/idx  "
            f"(t1={t1*1e3:.1f} ms, t2={t2*1e3:.1f} ms)")
    except Exception as e:
        log(f"P1 FAILED: {type(e).__name__}: {str(e)[:200]}")


# ---------------------------------------------------------------- P3
def p3_chain_gather(B=256, blocks=16):
    """Gather from a [blocks*128] i32 table via per-block lane gathers +
    where-chain — the >128-entry-table fallback."""

    def kernel(it_ref, tab_ref, idx_ref, out_ref):
        def body(i, carry):
            idx, acc = carry
            idx = (idx + acc) & (blocks * 128 - 1)
            hi = idx >> 7
            lo = idx & 127
            out = jnp.zeros_like(acc)
            for k in range(blocks):
                tab = jnp.broadcast_to(tab_ref[k][None, :], lo.shape)
                v = jnp.take_along_axis(tab, lo, axis=1)
                out = jnp.where(hi == k, v, out)
            return (idx, acc + out)

        _, acc = jax.lax.fori_loop(
            0, it_ref[0], body,
            (idx_ref[...], jnp.zeros((B, 128), jnp.int32)))
        out_ref[...] = acc

    @jax.jit
    def run(iters, tab, idx):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((B, 128), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(jnp.reshape(iters, (1,)), tab, idx)

    tab = jnp.arange(blocks * 128, dtype=jnp.int32).reshape(blocks, 128)
    idx = jnp.asarray(np.random.randint(0, blocks * 128, (B, 128)), jnp.int32)
    try:
        ns, t1, t2 = diff_cost(run, 512, tab, idx, unit_work=B * 128)
        log(f"P3 chain-gather {blocks}x128 [B={B}]: {ns:.4f} ns/idx  "
            f"(t1={t1*1e3:.1f} ms, t2={t2*1e3:.1f} ms)")
    except Exception as e:
        log(f"P3 FAILED: {type(e).__name__}: {str(e)[:200]}")


# ---------------------------------------------------------------- P4
def p4_vpu_ops(B=256):
    """~12 mixed i32/f32 VPU ops per iteration, DDA-step-shaped."""

    def kernel(it_ref, a_ref, b_ref, out_ref):
        def body(i, st):
            x, y = st
            m = (x & 31) < 16
            y = jnp.where(m, y * 1.0000001 + 0.5, y)
            x = x + jnp.where(m, 1, 2)
            m2 = y < 1e9
            x = jnp.where(m2, x ^ (x >> 3), x)
            y = jnp.where(m2, y, y * 0.5)
            return (x, y)

        x, y = jax.lax.fori_loop(0, it_ref[0], body, (a_ref[...], b_ref[...]))
        out_ref[...] = x + y.astype(jnp.int32)

    @jax.jit
    def run(iters, a, b):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((B, 128), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(jnp.reshape(iters, (1,)), a, b)

    a = jnp.ones((B, 128), jnp.int32)
    b = jnp.ones((B, 128), jnp.float32)
    ns, t1, t2 = diff_cost(run, 8192, a, b, unit_work=B * 128)
    log(f"P4 VPU loop ~12 ops/iter [B={B}]: {ns:.4f} ns/elem·iter  "
        f"(t1={t1*1e3:.1f} ms, t2={t2*1e3:.1f} ms)")


def main():
    log("devices:", jax.devices())
    # null round trip for context
    z = jnp.zeros((8, 128))
    f = jax.jit(lambda x: x + 1.0)
    t = timed(f, z)
    log(f"P0 dispatch+pull constant: {t * 1e3:.2f} ms")
    x1_row_gather()
    p1_lane_gather()
    p3_chain_gather()
    p4_vpu_ops()
    for B in (32, 1024):
        p1_lane_gather(B=B)


if __name__ == "__main__":
    main()
