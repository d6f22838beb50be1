#!/usr/bin/env python
"""Honest re-measurement of XLA scatter-add / gather costs on the chip
(round-1 numbers used block_until_ready, which is a no-op through the
tunnel).  Decides the backward-pass redesign (VERDICT item 4)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def pull(x):
    return np.asarray(jnp.sum(jax.tree.leaves(x)[0].astype(jnp.float32)))


def timed(fn, *a, reps=5):
    pull(fn(*a))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        pull(fn(*a))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def diffcost(fn, k, *a, unit=1):
    t1 = timed(fn, jnp.int32(k), *a)
    t2 = timed(fn, jnp.int32(2 * k), *a)
    return (t2 - t1) / (k * unit) * 1e9, t1, t2


T = 1 << 20
N = 1 << 20


def scatter_1d(iters, idx, val):
    def body(i, acc):
        return acc.at[(idx + i) & (T - 1)].add(val)
    return jax.lax.fori_loop(0, iters, body,
                             jnp.zeros((T,), jnp.float32)).sum()


def gather_rows(iters, tab, idx):
    def body(i, acc):
        rows = jnp.take(tab, (idx + acc.astype(jnp.int32)[:1] * 0 + idx) & (T - 1), axis=0)
        return acc + rows[:, 0] + rows[:, 1]
    return jax.lax.fori_loop(0, iters, body, jnp.zeros((N,), jnp.float32)).sum()


def gather_rows_dep(iters, tab, idx):
    def body(i, carry):
        j, acc = carry
        rows = jnp.take(tab, j, axis=0)
        j = (j + rows[:, 1].astype(jnp.int32) + 1) & (T - 1)
        return (j, acc + rows[:, 0])
    _, acc = jax.lax.fori_loop(0, iters, body,
                               (idx, jnp.zeros((N,), jnp.float32)))
    return acc.sum()


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, T, N), jnp.int32)
    val = jnp.asarray(rng.normal(size=N), jnp.float32)
    tab = jnp.asarray(rng.normal(size=(T, 2)), jnp.float32)

    ns, t1, t2 = diffcost(jax.jit(scatter_1d), 8, idx, val, unit=N)
    print(f"scatter-add 1M rows into 1M table: {ns:.3f} ns/row "
          f"(t1={t1*1e3:.0f} ms)", flush=True)

    # low-collision vs high-collision
    idx_dup = jnp.asarray(rng.integers(0, 1024, N), jnp.int32)
    ns2, *_ = diffcost(jax.jit(scatter_1d), 8, idx_dup, val, unit=N)
    print(f"scatter-add 1M rows, 1K distinct: {ns2:.3f} ns/row", flush=True)

    ns3, *_ = diffcost(jax.jit(gather_rows_dep), 8, tab, idx, unit=N)
    print(f"gather [T,2] rows (dep chain): {ns3:.3f} ns/row", flush=True)

    # scan-of-small-scatters vs one big scatter
    S = 16
    idx_s = jnp.asarray(rng.integers(0, T, (S, N // S)), jnp.int32)
    val_s = jnp.asarray(rng.normal(size=(S, N // S)), jnp.float32)

    def scan_scatter(iters, idx_s, val_s):
        def outer(i, acc0):
            def body(acc, xs):
                ix, vx = xs
                return acc.at[ix].add(vx), None
            acc, _ = jax.lax.scan(body, acc0, (idx_s, val_s))
            return acc
        return jax.lax.fori_loop(0, iters, outer,
                                 jnp.zeros((T,), jnp.float32)).sum()

    ns4, *_ = diffcost(jax.jit(scan_scatter), 8, idx_s, val_s, unit=N)
    print(f"scan of {S} scatters (same total rows): {ns4:.3f} ns/row",
          flush=True)


if __name__ == "__main__":
    main()
