"""TPU-friendly table lookups.

Gathers execute on the TPU scalar core and are a profiled bottleneck for
the shading path. For small tables the one-hot matmul trick moves the
lookup onto the MXU: value = onehot(ids, N) @ table, which is orders of
magnitude faster for N up to a few thousand rows. Large tables fall back
to a real gather.
"""
from __future__ import annotations

import jax.numpy as jnp

F32 = jnp.float32

ONE_HOT_MAX = 1024


def _one_hot(ids, n):
    iota = jnp.arange(n, dtype=jnp.int32)[None, :]
    return (ids[:, None] == iota).astype(F32)


def gather_rows(table, ids, one_hot_max: int = ONE_HOT_MAX):
    """table: (N, ...) array; ids: (R,) int32 (assumed in-range). Returns
    (R, ...). One-hot matmul when N is small (static decision)."""
    import jax

    n = table.shape[0]
    if n == 0 or n > one_hot_max or ids.ndim != 1:
        # Isolate the gather with barriers on BOTH sides: when XLA fuses a
        # TPU gather with surrounding ops (pad/clamp on the indices, the
        # consumers of the rows) the fused emission runs at ~135M rows/s;
        # a standalone gather lowers to the fast path (~25G rows/s).
        ids_b = jax.lax.optimization_barrier(ids)
        return jax.lax.optimization_barrier(table[ids_b])
    flat = table.reshape(n, -1).astype(F32)
    out = jnp.dot(_one_hot(ids, n), flat, preferred_element_type=jnp.float32)
    out = out.reshape(ids.shape + table.shape[1:])
    if jnp.issubdtype(table.dtype, jnp.integer) or table.dtype == jnp.bool_:
        out = jnp.round(out).astype(table.dtype)
    elif table.dtype != out.dtype:
        out = out.astype(table.dtype)
    return out
