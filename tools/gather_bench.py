"""Gather bandwidth vs row size on the TPU.

Decides the cluster tracer's leaf size: per-ray candidate consumption
gathers one (row_floats,) row per (ray, candidate); the sustained GB/s at
each row size sets the traversal throughput ceiling.

Rows are gathered with random indices from a table sized like the bench
scene's triangle soup (~6MB), looped K times inside one jit with a carried
dependency to amortize the ~40ms tunnel sync floor.
"""
from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp


def _sync(out):
    return float(jnp.ravel(out)[0])


def main():
    key = jax.random.PRNGKey(0)
    R = 1 << 20  # rays

    @jax.jit
    def nop(x):
        return x + 1.0

    x0 = jnp.zeros(())
    _sync(nop(x0))
    floor = min(
        (lambda t0: (_sync(nop(x0)), time.perf_counter() - t0)[1])(time.perf_counter())
        for _ in range(5)
    )
    print(f"sync floor: {floor * 1e3:.2f} ms")

    for row_floats in (32, 64, 96, 128, 160, 192, 256, 384):
        n_rows = max(6 * 1024 * 1024 // (row_floats * 4), 64)
        tab = jax.random.normal(key, (n_rows, row_floats), jnp.float32)
        idx = jax.random.randint(jax.random.fold_in(key, 1), (R,), 0, n_rows)
        K = 4

        @jax.jit
        def f(tab, idx):
            def body(c, _):
                rows = tab[(idx + c.astype(jnp.int32)[..., None].squeeze()) % n_rows]
                return c + jnp.sum(rows, axis=1) * 1e-9, 0.0

            out, _ = jax.lax.scan(body, jnp.zeros(R, jnp.float32), None, length=K)
            return out[0]

        _sync(f(tab, idx))
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            _sync(f(tab, idx))
            best = min(best, time.perf_counter() - t0)
        per = (best - floor) / K
        gb = R * row_floats * 4 / per / 1e9
        print(
            f"row {row_floats * 4:6d} B  ({n_rows} rows): {per * 1e3:8.2f} ms/gather-pass"
            f"  {gb:7.1f} GB/s  {R / per / 1e6:8.1f} Mrows/s"
        )


if __name__ == "__main__":
    main()
