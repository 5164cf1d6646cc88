"""Triangle clustering for the dense cluster tracer (device/cluster_trace.py).

TPU-first replacement for per-node BVH traversal on mesh scenes: instead of
a divergent stack walk (scalar-latency-bound on TPU — measured ~800ns per
node visit in the Pallas packet kernel), triangles are partitioned into
fixed-size spatial clusters. Traversal then becomes two DENSE phases that
map straight onto the VPU / HBM strengths:

  1. all rays x all cluster AABBs slab tests  (~98G tests/s measured)
  2. per-ray gather of the nearest candidate cluster's triangle block
     (6KB rows stream at ~370GB/s) + dense watertight test of all K tris

The partition is a largest-axis median split over triangle centroids,
recursing until ranges are <= K and aligning interior splits to multiples
of K so every cluster except the global last is exactly full — the device
tables are rectangular (C, K*12) with a validity lane.

Semantic reference: this plays the role of the reference's BVH leaves
(src/accelerators/bvh.rs:301-375 SAH build); correctness parity is via the
identical watertight triangle test, not the tree shape.
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np


@dataclass
class ClusterTables:
    bounds_lo: np.ndarray  # (C, 3) f32
    bounds_hi: np.ndarray  # (C, 3) f32
    tri_rows: np.ndarray   # (C, K*12) f32: per tri v0/v1/v2 xyz, prim_row, valid, pad
    K: int


def _median_partition(cent: np.ndarray, K: int) -> np.ndarray:
    """Permutation grouping triangles into spatially tight runs of K."""
    T = cent.shape[0]
    perm = np.arange(T)
    stack = [(0, T)]
    while stack:
        s, e = stack.pop()
        if e - s <= K:
            continue
        seg = perm[s:e]
        c = cent[seg]
        ax = int(np.argmax(c.max(axis=0) - c.min(axis=0)))
        order = np.argsort(c[:, ax], kind="stable")
        perm[s:e] = seg[order]
        half = (e - s) // 2
        half = max(K, (half // K) * K)  # keep left clusters exactly full
        stack.append((s, s + half))
        stack.append((s + half, e))
    return perm


def build_clusters(v0, v1, v2, prim_rows, K: int = 128) -> ClusterTables:
    """v0/v1/v2: (T, 3) world-space triangle verts; prim_rows: (T,) global
    primitive row of each triangle (what shading looks up)."""
    v0 = np.asarray(v0, np.float32)
    v1 = np.asarray(v1, np.float32)
    v2 = np.asarray(v2, np.float32)
    prim_rows = np.asarray(prim_rows, np.float32)
    T = v0.shape[0]
    lo = np.minimum(np.minimum(v0, v1), v2)
    hi = np.maximum(np.maximum(v0, v1), v2)
    cent = (lo + hi) * 0.5
    perm = _median_partition(cent, K)
    C = (T + K - 1) // K
    pad = C * K - T
    if pad:
        perm = np.concatenate([perm, np.full(pad, perm[-1], perm.dtype)])
    idx = perm.reshape(C, K)
    valid = np.ones((C, K), np.float32)
    if pad:
        valid[-1, K - pad:] = 0.0

    rows = np.zeros((C, K, 12), np.float32)
    rows[:, :, 0:3] = v0[idx]
    rows[:, :, 3:6] = v1[idx]
    rows[:, :, 6:9] = v2[idx]
    rows[:, :, 9] = prim_rows[idx]
    rows[:, :, 10] = valid

    # cluster bounds over VALID tris only (pad tris repeat a real one, so
    # they cannot widen the box anyway, but be explicit)
    blo = np.where(valid[..., None] > 0, lo[idx], np.inf).min(axis=1)
    bhi = np.where(valid[..., None] > 0, hi[idx], -np.inf).max(axis=1)
    return ClusterTables(
        bounds_lo=blo.astype(np.float32),
        bounds_hi=bhi.astype(np.float32),
        tri_rows=rows.reshape(C, K * 12),
        K=K,
    )
