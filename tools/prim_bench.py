"""Primitive-throughput probes that decide the traversal redesign.

The tunneled chip has a ~40ms host-sync round-trip floor, so each
primitive is looped K times inside one jit (with a carried data
dependency) and the floor is measured and subtracted.
"""
from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(jnp.ravel(leaf)[0])


FLOOR = None


def measure_floor():
    global FLOOR

    @jax.jit
    def nop(x):
        return x + 1.0

    x = jnp.zeros(())
    _sync(nop(x))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        _sync(nop(x))
        ts.append(time.perf_counter() - t0)
    FLOOR = min(ts)
    print(f"sync floor: {FLOOR * 1e3:.2f} ms")


def bench(name, make_looped, K, unit_count, unit="items", reps=3):
    """make_looped() -> (jitted fn, args). fn must run the op K times."""
    fn, args = make_looped()
    _sync(fn(*args))
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        _sync(fn(*args))
        best = min(best, time.perf_counter() - t0)
    per_op = max((best - FLOOR) / K, 1e-9)
    rate = unit_count / per_op
    print(f"{name:46s} {per_op * 1e3:8.3f} ms/op  {rate / 1e6:10.1f} M{unit}/s")


def main():
    key = jax.random.PRNGKey(0)
    measure_floor()
    R = 1 << 20

    # 1. fat row gather
    C, D = 1024, 1536
    def mk_fat():
        table = jax.random.normal(key, (C, D), jnp.float32)
        idx = jax.random.randint(jax.random.fold_in(key, 1), (R,), 0, C)

        @jax.jit
        def f(t, i):
            def body(c, _):
                s, ii = c
                s = s + jnp.sum(t[ii], axis=1)
                ii = (ii + 1) % C
                return (s, ii), 0.0
            (s, _), _ = jax.lax.scan(body, (jnp.zeros(R), i), None, length=8)
            return s
        return f, (table, idx)
    bench("gather 6KB rows (1M)", mk_fat, 8, R, "rows")

    # 1b. skinny gather
    def mk_skinny():
        t2 = jax.random.normal(key, (131072, 8), jnp.float32)
        i2 = jax.random.randint(jax.random.fold_in(key, 2), (R,), 0, 131072)

        @jax.jit
        def f(t, i):
            def body(c, _):
                s, ii = c
                s = s + jnp.sum(t[ii], axis=1)
                ii = (ii + 1) % 131072
                return (s, ii), 0.0
            (s, _), _ = jax.lax.scan(body, (jnp.zeros(R), i), None, length=8)
            return s
        return f, (t2, i2)
    bench("gather 32B rows (1M)", mk_skinny, 8, R, "rows")

    # 2. dense slab tests (Rb, C)
    Rb = 1 << 16
    def mk_slab():
        o = jax.random.normal(key, (Rb, 3))
        d = jax.random.normal(jax.random.fold_in(key, 3), (Rb, 3))
        inv = 1.0 / d
        lo = jax.random.normal(jax.random.fold_in(key, 4), (C, 3)) - 2.0
        hi = lo + 4.0

        @jax.jit
        def f(o, inv, lo, hi):
            def body(c, _):
                s, o_ = c
                t0 = (lo[None] - o_[:, None, :]) * inv[:, None, :]
                t1 = (hi[None] - o_[:, None, :]) * inv[:, None, :]
                tn = jnp.max(jnp.minimum(t0, t1), axis=2)
                tf = jnp.min(jnp.maximum(t0, t1), axis=2)
                te = jnp.where((tn <= tf) & (tf > 0), tn, jnp.inf)
                s = s + jnp.min(te, axis=1)
                return (s, o_ + 1e-6), 0.0
            (s, _), _ = jax.lax.scan(body, (jnp.zeros(Rb), o), None, length=8)
            return s
        return f, (o, inv, lo, hi)
    bench(f"dense slab {Rb}x{C}", mk_slab, 8, Rb * C, "tests")

    # 3. argsort
    def mk_sort(n):
        def mk():
            ks = jax.random.randint(key, (n,), 0, 1 << 30, jnp.uint32)

            @jax.jit
            def f(k):
                def body(c, _):
                    perm = jnp.argsort(c)
                    return c[perm] ^ jnp.uint32(1), 0.0
                out, _ = jax.lax.scan(body, k, None, length=4)
                return out
            return f, (ks,)
        return mk
    bench("argsort 1M u32", mk_sort(R), 4, R, "keys")

    # 4. Pluecker matmul (R,6)x(6,384)
    def mk_mm():
        a = jax.random.normal(key, (R // 4, 6))
        b = jax.random.normal(jax.random.fold_in(key, 5), (6, 384))

        @jax.jit
        def f(a, b):
            def body(c, _):
                s = jnp.dot(c, b, preferred_element_type=jnp.float32)  # (R4, 384)
                c2 = c + jnp.mean(s, axis=1, keepdims=True) * 1e-9
                return c2, 0.0
            out, _ = jax.lax.scan(body, a, None, length=8)
            return out
        return f, (a, b)
    bench("matmul (262k,6)x(6,384) f32", mk_mm, 8, (R // 4) * 384, "pair-dots")

    # 4c. big dense f32 matmul flops check (2k,2k)x(2k,2k)
    def mk_big():
        a = jax.random.normal(key, (2048, 2048))
        b = jax.random.normal(jax.random.fold_in(key, 6), (2048, 2048))

        @jax.jit
        def f(a, b):
            def body(c, _):
                return jnp.dot(c, b, preferred_element_type=jnp.float32) * 1e-3, 0.0
            out, _ = jax.lax.scan(body, a, None, length=8)
            return out
        return f, (a, b)
    bench("matmul 2048^3 f32 (flops probe)", mk_big, 8, 2048**3 // 10**0, "mul-adds")

    # 5. segment_sum
    def mk_seg():
        vals = jax.random.normal(key, (R, 3))
        seg = jax.random.randint(key, (R,), 0, 500000)

        @jax.jit
        def f(v, s):
            def body(c, _):
                acc = jax.ops.segment_sum(c, s, num_segments=500000)
                return c + acc[s % 500000] * 1e-9, 0.0
            out, _ = jax.lax.scan(body, v, None, length=4)
            return out
        return f, (vals, seg)
    bench("segment_sum 1M->500k", mk_seg, 4, R, "items")

    # 6. while_loop iteration floor
    def mk_wl():
        x = jax.random.normal(key, (8, 128))

        @jax.jit
        def f(x):
            def body(c):
                i, v = c
                return i + 1, v * 1.0000001 + 0.1
            return jax.lax.while_loop(lambda c: c[0] < 10000, body, (0, x))[1]
        return f, (x,)
    bench("while_loop trivial iter", mk_wl, 10000, 1, "iters")


if __name__ == "__main__":
    main()
