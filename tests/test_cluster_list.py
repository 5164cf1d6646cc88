"""SAH cluster tables: host build invariants.

The tables feed the binned traversal tier (device/binned.py, parity in
tests/test_binned.py); the cluster-list Pallas kernel they originally fed
was removed after the A/B (it tied pallas-wide coherent and lost 2x
incoherent — VERDICT r2 task 5)."""
from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pbrt_tpu.scene.clusters import TRI_F, build_sah_clusters


def _mesh(n=28, seed=0):
    """Bumpy terrain grid (2*n^2 tris) like the bench scene, small."""
    rng = np.random.default_rng(seed)
    us = np.linspace(-2, 2, n + 1)
    gu, gv = np.meshgrid(us, us)
    gy = 0.6 * np.sin(1.7 * gu) * np.cos(1.3 * gv)
    verts = np.stack([gu, gy, gv], axis=-1).reshape(-1, 3)
    idx = []
    for i in range(n):
        for j in range(n):
            a = i * (n + 1) + j
            b, c, d = a + 1, a + n + 1, a + n + 2
            idx.append([a, c, b])
            idx.append([b, c, d])
    idx = np.asarray(idx, np.int64)
    tv = verts[idx]  # (T, 3, 3)
    return tv.astype(np.float32)


def test_sah_clusters_cover_all_tris():
    tv = _mesh()
    T = tv.shape[0]
    ct = build_sah_clusters(tv[:, 0], tv[:, 1], tv[:, 2], np.arange(T), K=32)
    rows = ct.tri_rows.reshape(ct.n_clusters, 32, TRI_F)
    valid = rows[:, :, 10] > 0
    prims = rows[:, :, 9][valid].astype(np.int64)
    assert sorted(prims.tolist()) == list(range(T))  # every tri exactly once
    # every valid tri's verts inside its cluster AABB
    for c in range(ct.n_clusters):
        v = rows[c][valid[c]][:, 0:9].reshape(-1, 3)
        if len(v):
            assert (v >= ct.cl_lo[c] - 1e-4).all()
            assert (v <= ct.cl_hi[c] + 1e-4).all()


