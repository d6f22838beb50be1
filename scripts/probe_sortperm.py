#!/usr/bin/env python
"""Price the per-bounce reorder primitives in isolation (round-5 item:
the [n,22] permute + 2-operand sort measured 88 + 47 ms inside the
city-XL frame — PERF_NOTES round-5).  Chained fori_loop timing (the only
methodology that cancels the ~25 ms tunnel dispatch, PERF_NOTES round-4).

Variants:
  sort2    — lax.sort((i32 key, i32 iota), num_keys=1)   [current frame op]
  sort1    — lax.sort(single u32: key<<21 | iota)        [coarse 10-bit key]
  take22   — jnp.take([n,22] f32, perm, axis=0)          [current permute]
  take7    — jnp.take([n,7]  f32, perm, axis=0)          [slim variant]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

N = 1920 * 1080


def pull(x):
    return np.asarray(jnp.sum(jax.tree.leaves(x)[0].astype(jnp.float32)))


def timed(fn, *a, reps=3):
    pull(fn(*a))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        pull(fn(*a))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def chained(fn, k, *a):
    """(t_2k - t_k) / k in ms per call."""
    t1 = timed(fn, jnp.int32(k), *a)
    t2 = timed(fn, jnp.int32(2 * k), *a)
    return (t2 - t1) / k * 1e3, t1, t2


iota = jnp.arange(N, dtype=jnp.int32)


@jax.jit
def sort2(iters, key):
    def body(i, carry):
        k, acc = carry
        ks, perm = jax.lax.sort((k ^ i, iota), num_keys=1)
        return (ks, acc + perm[0])
    _, acc = jax.lax.fori_loop(0, iters, body, (key, jnp.int32(0)))
    return acc


@jax.jit
def sort1(iters, key):
    # coarse 10-bit cluster key in bits 21..30, iota in bits 0..20
    def body(i, carry):
        k, acc = carry
        packed = (((k ^ i) & 0x3FF) << 21) | iota
        ks = jax.lax.sort(packed)
        perm = ks & 0x1FFFFF
        return (k, acc + perm[0])
    _, acc = jax.lax.fori_loop(0, iters, body, (key, jnp.int32(0)))
    return acc


def take_w(w):
    mat = jnp.ones((N, w), jnp.float32)

    @jax.jit
    def f(iters, perm):
        def body(i, carry):
            p, acc = carry
            rows = jnp.take(mat, p, axis=0)
            p = (p + i) % N
            return (p, acc + rows[0, 0])
        _, acc = jax.lax.fori_loop(0, iters, body, (perm, jnp.float32(0)))
        return acc
    return f


def main():
    print("devices:", jax.devices(), file=sys.stderr)
    rng = np.random.default_rng(0)
    key = jnp.asarray(rng.integers(0, 1 << 15, N), jnp.int32)
    perm = jnp.asarray(rng.permutation(N), jnp.int32)

    for name, fn, arg in [
        ("sort2 (key,iota)", sort2, key),
        ("sort1 packed u32", sort1, key),
        ("take [n,22]", take_w(22), perm),
        ("take [n,7]", take_w(7), perm),
        ("take [n,2]", take_w(2), perm),
    ]:
        ms, t1, t2 = chained(fn, 8, arg)
        print(f"{name:20s}: {ms:7.2f} ms/call   (t8={t1*1e3:.0f} t16={t2*1e3:.0f})")


def take_chunked(w, chunk):
    mat = jnp.ones((N, w), jnp.float32)

    @jax.jit
    def f(iters, perm):
        def body(i, carry):
            p, acc = carry
            parts = [jnp.take(mat[:, c:c + chunk], p, axis=0)
                     for c in range(0, w, chunk)]
            rows = jnp.concatenate(parts, axis=1)
            p = (p + i) % N
            return (p, acc + rows[0, 0])
        _, acc = jax.lax.fori_loop(0, iters, body, (perm, jnp.float32(0)))
        return acc
    return f


def main2():
    rng = np.random.default_rng(0)
    perm = jnp.asarray(rng.permutation(N), jnp.int32)
    for name, fn in [
        ("take [n,8]", take_w(8)),
        ("take [n,11]", take_w(11)),
        ("take [n,16]", take_w(16)),
        ("take 22 as 3x8", take_chunked(22, 8)),
        ("take 22 as 2x11", take_chunked(22, 11)),
        ("take 24 as 3x8", take_chunked(24, 8)),
    ]:
        ms, t1, t2 = chained(fn, 8, perm)
        print(f"{name:20s}: {ms:7.2f} ms/call   (t8={t1*1e3:.0f} t16={t2*1e3:.0f})")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "2":
        main2()
    else:
        main()
