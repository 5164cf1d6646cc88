"""SAH triangle clustering: the geometry tables of the binned traversal
tier (device/binned.py).

Clusters are cut from the binned-SAH binary BVH (scene/bvh.py): every
maximal subtree holding <= K triangles becomes one cluster; a coarser
cut of the same tree groups clusters into supernodes whose member AABBs
are packed into 512B row-gatherable records. Depth-first emission makes
each subtree's prims contiguous in ``bvh.prim_ids`` — a cluster is a
contiguous run of the SAH-ordered triangle list, and consecutive
clusters are spatially coherent.

(The cluster-LIST Pallas kernel these tables originally fed was removed
after its A/B: it tied the wide-BVH packet kernel on coherent waves and
lost 2x on incoherent ones — round-2 verdict task 5.)

Semantic reference: clusters play the role of the reference BVH's leaves
(/root/reference/src/accelerators/bvh.rs:301-375 SAH build); correctness
parity comes from the identical watertight triangle test, not tree shape.
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .bvh import build_bvh

# floats per triangle row: v0 xyz, v1 xyz, v2 xyz, prim_row, valid, pad
TRI_F = 12
# cluster-id striding stride (ids are striped across SEG-sized segments;
# kept for table stability — the binned tier is order-agnostic)
SEG = 128


@dataclass
class ClusterTables:
    cl_lo: np.ndarray     # (C, 3) f32 cluster AABB mins
    cl_hi: np.ndarray     # (C, 3) f32 cluster AABB maxs
    tri_rows: np.ndarray  # (C, K*TRI_F) f32 cluster triangle blocks
    K: int
    # supernode level for the binned tier (device/binned.py): groups of
    # spatially-adjacent clusters from a coarser cut of the SAME SAH tree
    su_lo: np.ndarray | None = None       # (S, 3)
    su_hi: np.ndarray | None = None       # (S, 3)
    su_members: np.ndarray | None = None  # (S, SUPER_M) i32 cluster ids, -1 pad
    # row-gatherable member bounds: lane m*8+0..7 = (lox loy loz hix hiy
    # hiz cid pad) of member m — ONE 512B DMA row per (ray, supernode)
    # instead of 48 scalar-core element gathers (device/binned.py phase 2)
    su_bounds: np.ndarray | None = None   # (S, SUPER_M * 8) f32

    @property
    def n_clusters(self) -> int:
        return self.cl_lo.shape[0]


SUPER_M = 16  # cluster-member slots per supernode (chunked if exceeded)


def _sah_cluster_ranges(bvh, K: int) -> list[tuple[int, int]]:
    """Cut maximal subtrees with <= K prims; returns (start, count) ranges
    into bvh.prim_ids, in depth-first (spatially coherent) order."""
    n_prims_tot = int(np.sum(bvh.n_prims))
    # subtree prim counts via one depth-first pass (prims are contiguous)
    ranges: list[tuple[int, int]] = []
    # iterative: (node, prim_start); subtree prim count computed on the fly
    # by walking: leaf -> (offset, n); interior -> children contiguous.
    # First compute subtree counts bottom-up (post-order).
    n = len(bvh.n_prims)
    count = np.zeros(n, np.int64)
    start = np.zeros(n, np.int64)
    stack = [(0, False)]
    while stack:
        i, done = stack.pop()
        if bvh.n_prims[i] > 0:
            start[i] = bvh.offset[i]
            count[i] = bvh.n_prims[i]
            continue
        l, r = i + 1, int(bvh.offset[i])
        if done:
            start[i] = min(start[l], start[r])
            count[i] = count[l] + count[r]
        else:
            stack.append((i, True))
            stack.append((l, False))
            stack.append((r, False))

    walk = [0]
    while walk:
        i = walk.pop()
        if count[i] <= K or bvh.n_prims[i] > 0:
            ranges.append((int(start[i]), int(count[i])))
            continue
        l, r = i + 1, int(bvh.offset[i])
        # left-first keeps depth-first (spatial) order
        walk.append(r)
        walk.append(l)
    assert sum(c for _, c in ranges) == n_prims_tot
    return ranges


def build_sah_clusters(v0, v1, v2, prim_rows, K: int = 32) -> ClusterTables:
    """v0/v1/v2: (T, 3) world-space triangle verts; prim_rows: (T,) global
    primitive row of each triangle (what shading looks up)."""
    v0 = np.asarray(v0, np.float32)
    v1 = np.asarray(v1, np.float32)
    v2 = np.asarray(v2, np.float32)
    prim_rows = np.asarray(prim_rows, np.float32)
    T = v0.shape[0]
    lo = np.minimum(np.minimum(v0, v1), v2)
    hi = np.maximum(np.maximum(v0, v1), v2)

    bvh = build_bvh(lo.astype(np.float64), hi.astype(np.float64), max_prims_in_node=4)
    order = np.asarray(bvh.prim_ids, np.int64)
    ranges = _sah_cluster_ranges(bvh, K)
    C0 = len(ranges)
    # stride spatially-consecutive clusters across extraction segments
    # (see SEG above); pad to full segments with never-hit clusters
    n_seg = (C0 + SEG - 1) // SEG
    C = n_seg * SEG
    new_of_old = (np.arange(C0) % n_seg) * SEG + np.arange(C0) // n_seg

    rows = np.zeros((C, K, TRI_F), np.float32)
    cl_lo = np.full((C, 3), np.float32(3e38))
    cl_hi = np.full((C, 3), np.float32(-3e38))
    for c0, (s, cnt) in enumerate(ranges):
        c = new_of_old[c0]
        idx = order[s:s + cnt]
        rows[c, :cnt, 0:3] = v0[idx]
        rows[c, :cnt, 3:6] = v1[idx]
        rows[c, :cnt, 6:9] = v2[idx]
        rows[c, :cnt, 9] = prim_rows[idx]
        rows[c, :cnt, 10] = 1.0
        cl_lo[c] = lo[idx].min(axis=0)
        cl_hi[c] = hi[idx].max(axis=0)

    # --- supernode level: the coarser cut (<= SUPER_M*K tris) of the same
    # tree. Both cuts emit contiguous depth-first tri ranges, so every
    # cluster range nests inside exactly one supernode range; supernodes
    # with more than SUPER_M member clusters are chunked (chunk AABB =
    # union of its own members, so chunks stay tight).
    super_ranges = _sah_cluster_ranges(bvh, SUPER_M * K)
    su_starts = np.array([s for s, _ in super_ranges], np.int64)
    members: list[list[int]] = [[] for _ in super_ranges]
    for c0, (s, cnt) in enumerate(ranges):
        si = int(np.searchsorted(su_starts, s, side="right")) - 1
        members[si].append(int(new_of_old[c0]))
    su_lo_l, su_hi_l, su_mem_l = [], [], []
    for mem in members:
        for i in range(0, len(mem), SUPER_M):
            chunk = mem[i:i + SUPER_M]
            su_lo_l.append(cl_lo[chunk].min(axis=0))
            su_hi_l.append(cl_hi[chunk].max(axis=0))
            su_mem_l.append(chunk + [-1] * (SUPER_M - len(chunk)))

    su_mem = np.asarray(su_mem_l, np.int32)
    S = su_mem.shape[0]
    su_bounds = np.zeros((S, SUPER_M, 8), np.float32)
    for s in range(S):
        for m, cid in enumerate(su_mem[s]):
            if cid < 0:
                su_bounds[s, m, 0:3] = 3e38
                su_bounds[s, m, 3:6] = -3e38
                su_bounds[s, m, 6] = -1.0
            else:
                su_bounds[s, m, 0:3] = cl_lo[cid]
                su_bounds[s, m, 3:6] = cl_hi[cid]
                su_bounds[s, m, 6] = float(cid)

    return ClusterTables(
        cl_lo=cl_lo, cl_hi=cl_hi,
        tri_rows=rows.reshape(C, K * TRI_F), K=K,
        su_lo=np.asarray(su_lo_l, np.float32),
        su_hi=np.asarray(su_hi_l, np.float32),
        su_members=su_mem,
        su_bounds=su_bounds.reshape(S, SUPER_M * 8),
    )


# --- legacy median-split partition (kept for probe comparisons) -----------


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
    """Median-split clustering (exactly-full clusters); probe baseline."""
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

    rows = np.zeros((C, K, TRI_F), np.float32)
    rows[:, :, 0:3] = v0[idx]
    rows[:, :, 3:6] = v1[idx]
    rows[:, :, 6:9] = v2[idx]
    rows[:, :, 9] = prim_rows[idx]
    rows[:, :, 10] = valid

    blo = np.where(valid[..., None] > 0, lo[idx], np.inf).min(axis=1)
    bhi = np.where(valid[..., None] > 0, hi[idx], -np.inf).max(axis=1)
    return ClusterTables(
        cl_lo=blo.astype(np.float32),
        cl_hi=bhi.astype(np.float32),
        tri_rows=rows.reshape(C, K * TRI_F),
        K=K,
    )
