"""Host-side BVH construction (NumPy, binned SAH).

Builds the same flattened depth-first node layout as the reference's
``LinearBVHNode`` array (/root/reference/src/accelerators/bvh.rs:89-95,
flatten_bvhtree :662-693): per node an AABB, a primitive count (0 = interior),
an offset (first primitive for leaves, second child for interiors), and the
split axis for front-to-back traversal ordering.  Construction uses the
12-bucket SAH sweep (bvh.rs:301-375) vectorized over NumPy; HLBVH/Morton modes
are subsumed since build happens once on host.
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np

N_BUCKETS = 12
MAX_PRIMS_IN_NODE_DEFAULT = 4


@dataclass
class FlatBVH:
    bounds_min: np.ndarray  # (N, 3) f32
    bounds_max: np.ndarray  # (N, 3) f32
    offset: np.ndarray  # (N,) i32: leaf -> first prim index; interior -> second child
    n_prims: np.ndarray  # (N,) i32: 0 for interior nodes
    axis: np.ndarray  # (N,) i32 split axis
    prim_ids: np.ndarray  # (P,) i32 permutation of primitive indices
    max_leaf: int


class _Builder:
    def __init__(self, lo, hi, max_prims, split_method="sah"):
        self.lo = lo
        self.hi = hi
        self.cent = 0.5 * (lo + hi)
        self.max_prims = max_prims
        self.split_method = split_method
        self.order = []
        # flattened output, grown as we emit nodes depth-first
        self.nb_min = []
        self.nb_max = []
        self.noff = []
        self.nn = []
        self.nax = []

    def emit(self, bmin, bmax, off, n, axis):
        self.nb_min.append(bmin)
        self.nb_max.append(bmax)
        self.noff.append(off)
        self.nn.append(n)
        self.nax.append(axis)
        return len(self.nn) - 1

    def build(self, idx):
        """Recursively build over primitive indices `idx`; returns node index."""
        lo = self.lo[idx]
        hi = self.hi[idx]
        bmin = lo.min(axis=0)
        bmax = hi.max(axis=0)
        n = len(idx)
        if n <= 1:
            return self._leaf(idx, bmin, bmax)
        cent = self.cent[idx]
        cmin = cent.min(axis=0)
        cmax = cent.max(axis=0)
        diag = cmax - cmin
        axis = int(np.argmax(diag))
        if diag[axis] < 1e-12:
            return self._leaf(idx, bmin, bmax)

        if n <= 2 or self.split_method == "equal":
            # EqualCounts (bvh.rs SplitMethod::EqualCounts): median split
            order = np.argsort(cent[:, axis], kind="stable")
            mid = n // 2
            left_idx, right_idx = idx[order[:mid]], idx[order[mid:]]
        elif self.split_method == "middle":
            # Middle (bvh.rs SplitMethod::Middle): split at the centroid
            # bounds midpoint; degenerate partitions fall back to equal
            pmid = 0.5 * (cmin[axis] + cmax[axis])
            mask = cent[:, axis] < pmid
            if mask.all() or (~mask).all():
                order = np.argsort(cent[:, axis], kind="stable")
                mid = n // 2
                left_idx, right_idx = idx[order[:mid]], idx[order[mid:]]
            else:
                left_idx, right_idx = idx[mask], idx[~mask]
        else:
            # binned SAH (reference split_sah bvh.rs:301-375)
            b = np.minimum(
                (N_BUCKETS * (cent[:, axis] - cmin[axis]) / diag[axis]).astype(np.int32), N_BUCKETS - 1
            )
            counts = np.bincount(b, minlength=N_BUCKETS)
            INF = np.float64(np.inf)
            bb_min = np.full((N_BUCKETS, 3), INF)
            bb_max = np.full((N_BUCKETS, 3), -INF)
            for a in range(3):
                np.minimum.at(bb_min[:, a], b, lo[:, a])
                np.maximum.at(bb_max[:, a], b, hi[:, a])
            # prefix/suffix unions
            lmin = np.minimum.accumulate(bb_min, axis=0)
            lmax = np.maximum.accumulate(bb_max, axis=0)
            rmin = np.minimum.accumulate(bb_min[::-1], axis=0)[::-1]
            rmax = np.maximum.accumulate(bb_max[::-1], axis=0)[::-1]
            lcnt = np.cumsum(counts)
            rcnt = n - lcnt

            def area(mn, mx):
                d = np.maximum(mx - mn, 0.0)
                return 2.0 * (d[:, 0] * d[:, 1] + d[:, 1] * d[:, 2] + d[:, 0] * d[:, 2])

            la = area(lmin[:-1], lmax[:-1])
            ra = area(rmin[1:], rmax[1:])
            la = np.where(lcnt[:-1] > 0, la, 0.0)
            ra = np.where(rcnt[:-1] > 0, ra, 0.0)
            total_area = area(bmin[None, :], bmax[None, :])[0]
            cost = 1.0 + (lcnt[:-1] * la + rcnt[:-1] * ra) / max(total_area, 1e-30)
            best = int(np.argmin(cost))
            leaf_cost = float(n)
            if n <= self.max_prims and leaf_cost <= cost[best]:
                return self._leaf(idx, bmin, bmax)
            go_left = b <= best
            if not go_left.any() or go_left.all():
                order = np.argsort(cent[:, axis], kind="stable")
                mid = n // 2
                left_idx, right_idx = idx[order[:mid]], idx[order[mid:]]
            else:
                left_idx, right_idx = idx[go_left], idx[~go_left]

        node = self.emit(bmin, bmax, 0, 0, axis)
        self.build(left_idx)
        second = self.build(right_idx)
        self.noff[node] = second
        return node

    # --- HLBVH (bvh.rs:377-660): Morton-order treelets emitted by
    # successive code bits, merged under a binned-SAH upper tree treating
    # each treelet root as one item. The reference's value for HLBVH is
    # parallel build speed; the semantic output here matches its structure
    # (bit-split treelets below, SAH above) built serially in NumPy. ---

    def build_hlbvh(self, idx):
        cent = self.cent[idx]
        cmin = cent.min(axis=0)
        cmax = cent.max(axis=0)
        q = np.clip((cent - cmin) / np.maximum(cmax - cmin, 1e-30) * 1023.0, 0, 1023).astype(np.uint32)

        def spread(v):
            v = (v | (v << 16)) & np.uint32(0x30000FF)
            v = (v | (v << 8)) & np.uint32(0x300F00F)
            v = (v | (v << 4)) & np.uint32(0x30C30C3)
            v = (v | (v << 2)) & np.uint32(0x9249249)
            return v

        morton = spread(q[:, 0]) | (spread(q[:, 1]) << 1) | (spread(q[:, 2]) << 2)
        order = np.argsort(morton, kind="stable")
        idx_s = idx[order]
        m_s = morton[order]
        # treelets: runs sharing the top 12 Morton bits (bvh.rs:393-449)
        top = m_s >> 18
        starts = np.flatnonzero(np.r_[True, top[1:] != top[:-1]])
        ends = np.r_[starts[1:], len(idx_s)]
        treelets = [(idx_s[s:e], m_s[s:e]) for s, e in zip(starts, ends)]
        return self._upper_sah(treelets)

    def _emit_treelet(self, tidx, tm, bit):
        """LBVH treelet emission splitting on Morton bit `bit`
        (bvh.rs emit_lbvh :489-575)."""
        n = len(tidx)
        bmin = self.lo[tidx].min(axis=0)
        bmax = self.hi[tidx].max(axis=0)
        if n <= self.max_prims or bit < 0:
            off = len(self.order)
            self.order.extend(tidx.tolist())
            if n > self.max_prims:
                return self._wide_leaf(tidx, bmin, bmax, off)
            return self.emit(bmin, bmax, off, n, 0)
        bits = (tm >> np.uint32(bit)) & 1
        split = int(np.searchsorted(bits, 1))  # Morton-sorted => bit-sorted
        if split == 0 or split == n:
            return self._emit_treelet(tidx, tm, bit - 1)
        axis = bit % 3  # interleave order: bit 3k+0 = x, +1 = y, +2 = z
        node = self.emit(bmin, bmax, 0, 0, axis)
        self._emit_treelet(tidx[:split], tm[:split], bit - 1)
        second = self._emit_treelet(tidx[split:], tm[split:], bit - 1)
        self.noff[node] = second
        return node

    def _upper_sah(self, treelets):
        """Binned SAH over treelet roots (bvh.rs build_upper_sah :577-660)."""
        if len(treelets) == 1:
            ti, tm = treelets[0]
            return self._emit_treelet(ti, tm, 17)
        tb_min = np.stack([self.lo[t].min(axis=0) for t, _ in treelets])
        tb_max = np.stack([self.hi[t].max(axis=0) for t, _ in treelets])
        tc = 0.5 * (tb_min + tb_max)
        bmin = tb_min.min(axis=0)
        bmax = tb_max.max(axis=0)
        cmin = tc.min(axis=0)
        cmax = tc.max(axis=0)
        diag = cmax - cmin
        axis = int(np.argmax(diag))
        if diag[axis] < 1e-12:
            mid = len(treelets) // 2
            left, right = treelets[:mid], treelets[mid:]
        else:
            b = np.minimum((N_BUCKETS * (tc[:, axis] - cmin[axis]) / diag[axis]).astype(np.int32),
                           N_BUCKETS - 1)
            order = np.argsort(b, kind="stable")
            bs = b[order]
            costs = []
            for cut in range(N_BUCKETS - 1):
                k = int(np.searchsorted(bs, cut + 1))
                if k == 0 or k == len(order):
                    costs.append(np.inf)
                    continue
                li = order[:k]
                ri = order[k:]

                def area(mn, mx):
                    d = np.maximum(mx - mn, 0.0)
                    return 2.0 * (d[0] * d[1] + d[1] * d[2] + d[0] * d[2])

                la = area(tb_min[li].min(axis=0), tb_max[li].max(axis=0))
                ra = area(tb_min[ri].min(axis=0), tb_max[ri].max(axis=0))
                costs.append(la * len(li) + ra * len(ri))
            best = int(np.argmin(costs))
            k = int(np.searchsorted(bs, best + 1))
            if k == 0 or k == len(order):
                k = len(order) // 2
            left = [treelets[i] for i in order[:k]]
            right = [treelets[i] for i in order[k:]]
        node = self.emit(bmin, bmax, 0, 0, axis)
        self._upper_sah(left)
        second = self._upper_sah(right)
        self.noff[node] = second
        return node

    def _leaf(self, idx, bmin, bmax):
        off = len(self.order)
        self.order.extend(idx.tolist())
        # leaves wider than max_leaf are split into chained leaves via a
        # balanced interior fan to keep the device-side leaf loop bounded
        if len(idx) > self.max_prims:
            return self._wide_leaf(idx, bmin, bmax, off)
        return self.emit(bmin, bmax, off, len(idx), 0)

    def _wide_leaf(self, idx, bmin, bmax, off):
        #

        # split contiguous range into two interior children
        n = len(idx)
        node = self.emit(bmin, bmax, 0, 0, 0)
        half = n // 2
        self._range_leaf(off, half, bmin, bmax)
        second = self._range_leaf(off + half, n - half, bmin, bmax)
        self.noff[node] = second
        return node

    def _range_leaf(self, off, n, bmin, bmax):
        if n <= self.max_prims:
            return self.emit(bmin, bmax, off, n, 0)
        node = self.emit(bmin, bmax, 0, 0, 0)
        half = n // 2
        self._range_leaf(off, half, bmin, bmax)
        second = self._range_leaf(off + half, n - half, bmin, bmax)
        self.noff[node] = second
        return node


def build_bvh(lo: np.ndarray, hi: np.ndarray, max_prims_in_node: int = MAX_PRIMS_IN_NODE_DEFAULT,
              split_method: str = "sah") -> FlatBVH:
    """Build a flattened BVH over primitive AABBs (lo/hi: (P, 3)).

    split_method: "sah" (default, binned, bvh.rs:301-375), "middle"
    (centroid-midpoint partition), "equal" (median split), or "hlbvh"
    (Morton treelets + SAH upper tree, bvh.rs:377-660) — the reference's
    full SplitMethod set."""
    lo = np.asarray(lo, dtype=np.float64)
    hi = np.asarray(hi, dtype=np.float64)
    p = len(lo)
    if p == 0:
        return FlatBVH(
            bounds_min=np.zeros((1, 3), np.float32),
            bounds_max=np.zeros((1, 3), np.float32),
            offset=np.zeros(1, np.int32),
            n_prims=np.zeros(1, np.int32),
            axis=np.zeros(1, np.int32),
            prim_ids=np.zeros(0, np.int32),
            max_leaf=max_prims_in_node,
        )
    import sys

    old_limit = sys.getrecursionlimit()
    sys.setrecursionlimit(max(old_limit, 10000 + 64 * int(np.log2(p + 2))))
    b = _Builder(lo, hi, max_prims_in_node, split_method)
    try:
        if split_method == "hlbvh":
            b.build_hlbvh(np.arange(p, dtype=np.int64))
        else:
            b.build(np.arange(p, dtype=np.int64))
    finally:
        sys.setrecursionlimit(old_limit)
    return FlatBVH(
        bounds_min=np.asarray(b.nb_min, dtype=np.float32),
        bounds_max=np.asarray(b.nb_max, dtype=np.float32),
        offset=np.asarray(b.noff, dtype=np.int32),
        n_prims=np.asarray(b.nn, dtype=np.int32),
        axis=np.asarray(b.nax, dtype=np.int32),
        prim_ids=np.asarray(b.order, dtype=np.int32),
        max_leaf=max_prims_in_node,
    )
