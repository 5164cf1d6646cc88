"""List-driven cluster traversal: the mesh-scene closest/any-hit tier.

The wide-BVH packet kernel (pallas_bvh.py) walks a shared per-packet
stack; every pop pays a serial scalar chain (~450-800ns) and the packet's
cost is the UNION of its lanes' traversal paths — measured 1.35 Mrays/s on
incoherent bounce waves of the 123k-tri bench scene. This tier removes
the stack entirely:

  1. rays are coherence-sorted and packetized (shared with pallas_bvh);
  2. an XLA pre-pass culls each packet against ALL cluster AABBs with
     conservative interval arithmetic (dense slab tests) and emits a
     per-packet segmented candidate list (iterative per-segment argmin —
     jax.lax.top_k alone measured 36ms per 500k-ray wave);
  3. a Pallas kernel walks each packet's list from SMEM in GROUPS of 8:
     one exact (8 clusters x PACKET rays) AABB precheck with per-lane
     t_best pruning picks the clusters that can still matter (~8% of the
     conservative list on bounce waves), then a bit-walk runs the dense
     (32 tris x PACKET rays) watertight test only on those. False
     candidates cost ~20ns; true rounds ~400ns.

Clusters are SAH-BVH subtree cuts (scene/clusters.py), K=32 triangles:
measured per-ray exact candidates on the bench scene are mean 2.1 / p99 8
(camera) — the SAH cut is what keeps true rounds few.

Semantic parity: the watertight shear test is bit-identical to
pallas_bvh's leaf phase / intersect.ray_triangle (triangle.rs:136-399);
closest-hit returns (t, prim row, b1, b2) like wide_intersect. Packets
whose candidate count exceeds a segment's cap fall back to the wide-BVH
kernel (correctness is never capped).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_bvh import (
    GRID_G,
    PACKET,
    _low_bit_index,
    coherence_keys,
    pack_rays,
)

F32 = jnp.float32
I32 = jnp.int32
EPS = 1e-4  # matches intersect.SHADOW_EPS
SEG = 128  # clusters per extraction segment (one VPU lane row)
SEGCAP = 32  # per-segment candidate cap (overflow -> wide-BVH fallback);
# must be a multiple of the kernel's 8-wide precheck groups. Cluster ids
# are STRIDED across segments (scene/clusters.py) so spatial candidate
# runs spread across segments instead of saturating one.
GROUP = 8  # clusters per AABB-precheck group (one sublane row)
SUBPKT = 8  # interval-cull frusta per packet: a 256-ray bounce packet's
# single origin/direction interval is ~8x looser than the exact union
# (measured list 540 vs exact 70); 8 sub-frusta of 32 rays OR-reduced
# recover most of the exactness for 8 cheap dense passes


def _cluster_kernel(rankcnt_ref, lists_ref, aabb_ref, ctab_ref, rays_ref,
                    out_ref, best_ref, *, any_hit: bool, n_seg: int):
    """GRID_G packets x their rank-major candidate lists.

    rankcnt_ref: (GRID_G, SEGCAP) SMEM i32 valid entries per rank
    (non-increasing); lists_ref: (GRID_G, SEGCAP * n_seg) SMEM i32 cluster
    ids, rank-major (approximately near-to-far); aabb_ref:
    (C, 8) VMEM f32 cluster AABBs (lo xyz, hi xyz, pad); ctab_ref: packed
    cluster triangle blocks (VMEM, scene/clusters.pack_cluster_table);
    rays_ref: (GRID_G, 16, PACKET) pack_rays blocks; out_ref:
    (GRID_G, 8, PACKET); best_ref: (8, PACKET) VMEM scratch (row 0
    t_best, 1 prim, 2 b1, 3 b2).
    """
    iota8c = jax.lax.broadcasted_iota(I32, (8, 1), 0)
    pw2 = (1 << iota8c).astype(F32)  # (8,1): 1,2,4,...

    def run_packet(g, _):
        rr = rays_ref[g]
        ox, oy, oz = rr[0:1, :], rr[1:2, :], rr[2:3, :]
        ix, iy, iz = rr[3:4, :], rr[4:5, :], rr[5:6, :]
        sx, sy, sz = rr[6:7, :], rr[7:8, :], rr[8:9, :]
        t_max = rr[9:10, :]
        live = rr[13:14, :] > 0
        k0 = rr[14:15, :] > 0
        k1 = rr[15:16, :] > 0

        best_ref[0:1, :] = t_max
        best_ref[1:2, :] = jnp.full((1, PACKET), -1.0, F32)
        best_ref[2:4, :] = jnp.zeros((2, PACKET), F32)

        iota8 = iota8c.astype(F32)

        def tri_round(c):
            """Dense watertight test: cluster c's 32 tris x PACKET rays."""
            blk = ctab_ref[pl.ds((c // 2) * 8, 8), :]
            half = jax.lax.cond(c % 2 == 0,
                                lambda: blk[:, 0:64], lambda: blk[:, 64:128])
            # 4 groups of 8 triangles, tested as (8, PACKET) subrounds
            # (Mosaic rejects lane-offset concats into one (32, 16))
            for g4 in range(4):
                psub = half[:, g4 * 16:(g4 + 1) * 16]  # (8, 16)
                t_best = best_ref[0:1, :]
                valid = psub[:, 9:10] > 0
                pid_col = psub[:, 10:11]

                def _shear(j3, psub=psub):
                    vx = psub[:, 3 * j3:3 * j3 + 1] - ox
                    vy = psub[:, 3 * j3 + 1:3 * j3 + 2] - oy
                    vz = psub[:, 3 * j3 + 2:3 * j3 + 3] - oz
                    px = jnp.where(k0, vy, jnp.where(k1, vz, vx))
                    py = jnp.where(k0, vz, jnp.where(k1, vx, vy))
                    pz = jnp.where(k0, vx, jnp.where(k1, vy, vz))
                    return px + sx * pz, py + sy * pz, sz * pz

                x0, y0, z0 = _shear(0)
                x1, y1, z1 = _shear(1)
                x2, y2, z2 = _shear(2)
                e0 = x1 * y2 - y1 * x2
                e1_ = x2 * y0 - y2 * x0
                e2_ = x0 * y1 - y0 * x1
                same = ((e0 >= 0) & (e1_ >= 0) & (e2_ >= 0)) | \
                    ((e0 <= 0) & (e1_ <= 0) & (e2_ <= 0))
                det = e0 + e1_ + e2_
                dok = det != 0
                inv = 1.0 / jnp.where(dok, det, 1.0)
                t = (e0 * z0 + e1_ * z1 + e2_ * z2) * inv
                phit = valid & same & dok & (t > EPS) & (t < t_best)
                tc = jnp.where(phit, t, jnp.float32(1e30))
                tmin = jnp.min(tc, axis=0, keepdims=True)  # (1, PACKET)
                # 1e30 miss sentinel must never count as an improvement
                improved = tmin < jnp.minimum(t_best, jnp.float32(1e29))
                win_slot = jnp.max(jnp.where(tc == tmin, iota8, -1.0),
                                   axis=0, keepdims=True)
                win = (tc == tmin) & (iota8 == win_slot)
                prim_new = jnp.sum(jnp.where(win, pid_col, 0.0), axis=0, keepdims=True)
                best_ref[0:1, :] = jnp.where(improved, tmin, t_best)
                best_ref[1:2, :] = jnp.where(improved, prim_new, best_ref[1:2, :])
                if not any_hit:
                    b1_new = jnp.sum(jnp.where(win, e1_ * inv, 0.0), axis=0, keepdims=True)
                    b2_new = jnp.sum(jnp.where(win, e2_ * inv, 0.0), axis=0, keepdims=True)
                    best_ref[2:3, :] = jnp.where(improved, b1_new, best_ref[2:3, :])
                    best_ref[3:4, :] = jnp.where(improved, b2_new, best_ref[3:4, :])

        def grp_body(state):
            j, gi, n_grp, ns, rounds, done = state
            base = j * n_seg + gi * GROUP
            # 8 cluster AABBs on sublanes (ids beyond ns are list padding,
            # masked below; their AABB rows are still real -> safe loads)
            ids = [lists_ref[g, base + k] for k in range(GROUP)]
            rows = jnp.concatenate(
                [aabb_ref[pl.ds(ids[k], 1), :] for k in range(GROUP)], axis=0)
            # exact packet slab test with per-lane t_best pruning
            t_best = best_ref[0:1, :]
            t0x = (rows[:, 0:1] - ox) * ix
            t1x = (rows[:, 3:4] - ox) * ix
            t0y = (rows[:, 1:2] - oy) * iy
            t1y = (rows[:, 4:5] - oy) * iy
            t0z = (rows[:, 2:3] - oz) * iz
            t1z = (rows[:, 5:6] - oz) * iz
            tn = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
                             jnp.minimum(t0z, t1z))
            tf = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
                             jnp.maximum(t0z, t1z)) * 1.0000004
            in_list = (gi * GROUP + iota8c) < ns
            bhit = (tn <= tf) & (tf > 0) & (tn < t_best) & live & in_list
            anyc = jnp.max(jnp.where(bhit, 1.0, 0.0), axis=1, keepdims=True)
            m0 = jnp.sum(anyc * pw2).astype(I32)

            def bit_body(st):
                m, rounds, done = st
                k = _low_bit_index(m)
                m2 = m & (m - 1)
                c = lists_ref[g, base + k]
                tri_round(c)
                if any_hit:
                    # stop the whole packet once every live lane is occluded
                    missing = jnp.max(jnp.where(live & (best_ref[1:2, :] < 0), 1.0, 0.0))
                    done = missing == 0.0
                    m2 = jnp.where(done, 0, m2)
                return m2, rounds + 1, done

            _, rounds, done = jax.lax.while_loop(
                lambda st: st[0] != 0, bit_body, (m0, rounds, done))
            return j, gi + 1, n_grp, ns, rounds, done

        def rank_body(state):
            j, rounds, done = state
            ns = rankcnt_ref[g, j]
            n_grp = (ns + GROUP - 1) // GROUP
            _, _, _, _, rounds, done = jax.lax.while_loop(
                lambda st: (st[1] < st[2]) & jnp.logical_not(st[5]),
                grp_body, (j, jnp.int32(0), n_grp, ns, rounds, done))
            return j + 1, rounds, done

        def rank_cond(state):
            j, _, done = state
            # rank counts are non-increasing: the first empty rank ends it
            more = jnp.where(j < SEGCAP, rankcnt_ref[g, jnp.minimum(j, SEGCAP - 1)], 0) > 0
            return more & jnp.logical_not(done)

        _, rounds, _ = jax.lax.while_loop(
            rank_cond, rank_body, (jnp.int32(0), jnp.int32(0), jnp.asarray(False)))
        out_ref[g, 0:1, :] = best_ref[0:1, :]
        out_ref[g, 1:2, :] = best_ref[1:2, :]
        if not any_hit:
            out_ref[g, 2:4, :] = best_ref[2:4, :]
        # row 5: true (tri-tested) rounds — diagnostics/ns-per-round
        out_ref[g, 5:6, :] = jnp.full((1, PACKET), 1.0, F32) * rounds.astype(F32)
        return 0

    jax.lax.fori_loop(0, GRID_G, run_packet, 0)


@functools.partial(jax.jit, static_argnames=("any_hit", "interpret"))
def _run_lists(ctab, aabb, rays, lists, rank_cnt, any_hit, interpret):
    B = rays.shape[0]
    assert B % GRID_G == 0
    n_seg = lists.shape[1] // SEGCAP
    kernel = functools.partial(_cluster_kernel, any_hit=any_hit, n_seg=n_seg)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, 8, PACKET), F32),
        grid=(B // GRID_G,),
        in_specs=[
            pl.BlockSpec((GRID_G, SEGCAP), lambda b: (b, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((GRID_G, n_seg * SEGCAP), lambda b: (b, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((GRID_G, 16, PACKET), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((GRID_G, 8, PACKET), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((8, PACKET), F32)],
        interpret=interpret,
    )(rank_cnt, lists, aabb, ctab, rays)


def _spread6(v):
    """Spread 4-bit lanes to stride-6 positions (6-way Morton interleave)."""
    v = v & jnp.uint32(0xF)
    # bit b -> position 6b: 0,6,12,18
    return ((v & 1) | ((v & 2) << 5) | ((v & 4) << 10) | ((v & 8) << 15))


def balanced_keys(o, d, world_lo, world_inv_extent):
    """Sort keys interleaving origin AND direction Morton bits evenly.

    coherence_keys (pallas_bvh) gives origin 16 bits above direction 12 —
    right for the stack-packet kernel's origin-driven unions, but at 500k
    rays that is ~8 rays per origin cell, so a 32-ray cull subpacket spans
    several cells with direction order resetting in each: bounce frusta
    stay octant-wide (measured candidate lists ~8x the exact union). Here
    a 6D Morton (4 bits per origin axis + 4 per |direction| axis,
    interleaved) keeps consecutive rays tight in BOTH position and
    direction at every scale."""
    oc = ((d[:, 0] > 0).astype(jnp.uint32) * 4 +
          (d[:, 1] > 0).astype(jnp.uint32) * 2 +
          (d[:, 2] > 0).astype(jnp.uint32))
    q = jnp.clip((o - world_lo) * world_inv_extent * 16.0, 0.0, 15.0).astype(jnp.uint32)
    qd = jnp.clip(jnp.abs(d) * 15.999, 0.0, 15.0).astype(jnp.uint32)
    m = (_spread6(q[:, 0]) | (_spread6(q[:, 1]) << 1) | (_spread6(q[:, 2]) << 2)
         | (_spread6(qd[:, 0]) << 3) | (_spread6(qd[:, 1]) << 4)
         | (_spread6(qd[:, 2]) << 5))
    return (oc << 24) | m


def _interval_mul(a_lo, a_hi, b_lo, b_hi):
    """Interval product [a_lo,a_hi] x [b_lo,b_hi]."""
    p1 = a_lo * b_lo
    p2 = a_lo * b_hi
    p3 = a_hi * b_lo
    p4 = a_hi * b_hi
    return (jnp.minimum(jnp.minimum(p1, p2), jnp.minimum(p3, p4)),
            jnp.maximum(jnp.maximum(p1, p2), jnp.maximum(p3, p4)))


def packet_lists(cl_lo, cl_hi, o, d, t_arr):
    """Conservative per-packet segmented candidate lists.

    o/d: (B*PACKET, 3) SORTED rays; t_arr: (B*PACKET,) t_max (<=0 dead).
    Returns (lists (B, n_seg*SEGCAP) i32, segcnt (B, n_seg) i32,
    overflow (B,) bool). A cluster enters a packet's list iff SOME ray of
    the packet COULD enter its AABB before t_max (interval arithmetic
    over the packet's origin / inv-direction ranges — never misses a real
    hit). Extraction is per 128-cluster SEGMENT with SEGCAP iterative
    argmin passes — no top_k (measured 36ms on (2048, 5515), the whole
    cull budget); a segment with more than SEGCAP candidates overflows
    the packet to the wide-BVH fallback.
    """
    C = cl_lo.shape[0]
    B = o.shape[0] // PACKET
    S = PACKET // SUBPKT
    o_p = o.reshape(B * SUBPKT, S, 3)
    d_p = d.reshape(B * SUBPKT, S, 3)
    live = (t_arr > 0).reshape(B * SUBPKT, S)
    inv = 1.0 / jnp.where(jnp.abs(d_p) < 1e-30,
                          jnp.where(d_p < 0, -1e-30, 1e-30), d_p)
    big = jnp.float32(3e37)

    def rng(x, m):
        lo_ = jnp.min(jnp.where(m[..., None], x, big), axis=1)
        hi_ = jnp.max(jnp.where(m[..., None], x, -big), axis=1)
        return lo_, hi_

    olo, ohi = rng(o_p, live)  # (B*SUBPKT, 3)
    ilo, ihi = rng(inv, live)
    tlive_s = jnp.max(jnp.where(live, t_arr.reshape(B * SUBPKT, S), 0.0), axis=1)
    any_live_s = jnp.any(live, axis=1)
    # segment-padding clusters (cl_lo ~ 3e38, scene/clusters.py) must never
    # become candidates — their inverted boxes pass the interval test
    real = (cl_lo[:, 0] <= 1e37)[None, :]

    # interval slab per SUB-packet frustum, OR-reduced over the packet.
    # Subpacket python loop keeps the peak intermediate at (B, C); the
    # axis loop likewise avoids (B, C, 3)
    maybe = jnp.zeros((B, C), bool)
    te = jnp.full((B, C), jnp.inf, F32)
    for sp in range(SUBPKT):
        # subpacket sp of each packet (rows b*SUBPKT + sp)
        olo_s = olo.reshape(B, SUBPKT, 3)[:, sp]
        ohi_s = ohi.reshape(B, SUBPKT, 3)[:, sp]
        ilo_s = ilo.reshape(B, SUBPKT, 3)[:, sp]
        ihi_s = ihi.reshape(B, SUBPKT, 3)[:, sp]
        tl_s = tlive_s.reshape(B, SUBPKT)[:, sp]
        al_s = any_live_s.reshape(B, SUBPKT)[:, sp]
        tn_lb = jnp.full((B, C), -jnp.inf, F32)
        tf_ub = jnp.full((B, C), jnp.inf, F32)
        for ax in range(3):
            a_lo = cl_lo[None, :, ax] - ohi_s[:, None, ax]  # (B, C)
            a_hi = cl_lo[None, :, ax] - olo_s[:, None, ax]
            b_lo = cl_hi[None, :, ax] - ohi_s[:, None, ax]
            b_hi = cl_hi[None, :, ax] - olo_s[:, None, ax]
            il = ilo_s[:, None, ax]
            ih = ihi_s[:, None, ax]
            t0_lo, t0_hi = _interval_mul(a_lo, a_hi, il, ih)
            t1_lo, t1_hi = _interval_mul(b_lo, b_hi, il, ih)
            tn_lb = jnp.maximum(tn_lb, jnp.minimum(t0_lo, t1_lo))
            tf_ub = jnp.minimum(tf_ub, jnp.maximum(t0_hi, t1_hi))
        maybe_s = (tn_lb <= tf_ub) & (tf_ub > 0) & \
            (tn_lb < tl_s[:, None]) & al_s[:, None] & real
        maybe = maybe | maybe_s
        te = jnp.minimum(te, jnp.where(maybe_s, jnp.maximum(tn_lb, 0.0), jnp.inf))

    n_seg = (C + SEG - 1) // SEG
    if n_seg * SEG > C:
        te = jnp.pad(te, ((0, 0), (0, n_seg * SEG - C)), constant_values=jnp.inf)
    te3 = te.reshape(B, n_seg, SEG)
    counts_true = jnp.sum(jnp.isfinite(te3), axis=2)  # (B, n_seg)
    lane = jax.lax.broadcasted_iota(I32, (B, n_seg, SEG), 2)
    idx_parts = []
    cur = te3
    for _ in range(SEGCAP):
        a = jnp.argmin(cur, axis=2).astype(jnp.int32)
        idx_parts.append(a)
        cur = jnp.where(lane == a[:, :, None], jnp.inf, cur)
    seg_base = (jnp.arange(n_seg, dtype=jnp.int32) * SEG)[None, :, None]
    idx = jnp.stack(idx_parts, axis=2) + seg_base  # (B, n_seg, SEGCAP)
    segcnt = jnp.minimum(counts_true, SEGCAP).astype(jnp.int32)
    overflow = jnp.any(counts_true > SEGCAP, axis=1)

    # RANK-MAJOR layout: sort segments by count (desc), store all segments'
    # rank-0 entries, then rank-1, ... Within a segment entries are already
    # te-ascending, so rank order approximates GLOBAL near-to-far — the
    # kernel's per-lane t_best pruning engages early (unordered walks
    # measured ~2.7x more true rounds than the exact need). Rank j's valid
    # entries are contiguous: exactly rank_cnt[j] = #segments with count>j.
    order = jnp.argsort(-segcnt, axis=1, stable=True)  # (B, n_seg)
    idx_sorted = jnp.take_along_axis(idx, order[:, :, None], axis=1)
    ranks = jnp.swapaxes(idx_sorted, 1, 2)  # (B, SEGCAP, n_seg)
    # pad each rank row to a GROUP multiple: the kernel reads whole 8-wide
    # groups, and an unpadded final group would read past the rank (SMEM
    # out-of-bounds -> device fault). Pad ids point at cluster 0 but are
    # masked by the in-list check.
    n_pad = (n_seg + GROUP - 1) // GROUP * GROUP
    if n_pad > n_seg:
        ranks = jnp.pad(ranks, ((0, 0), (0, 0), (0, n_pad - n_seg)))
    lists = ranks.reshape(B, SEGCAP * n_pad)
    rank = jax.lax.broadcasted_iota(I32, (B, SEGCAP), 1)
    rank_cnt = jnp.sum(segcnt[:, None, :] > rank[:, :, None], axis=2).astype(jnp.int32)
    return lists, rank_cnt, overflow


def cluster_intersect(sa, static, o, d, t_max, any_hit=False, interpret=False,
                      sort=True):
    """Closest-hit / any-hit via the cluster-list tier.

    Same contract as pallas_bvh.wide_intersect: closest returns
    (t, prim, hit, b1, b2); any-hit returns (t, prim, hit). Packets whose
    candidate lists overflow a segment cap are re-traced through
    wide_intersect and merged (conservative-correct composition).
    """
    from .pallas_bvh import wide_intersect

    R0 = o.shape[0]
    t_arr = jnp.broadcast_to(jnp.asarray(t_max, F32), (R0,))
    perm = None
    if sort and R0 >= 2 * PACKET:
        wl = sa.world_center - sa.world_radius
        inv_ext = 1.0 / jnp.maximum(2.0 * sa.world_radius, 1e-20)
        # origin-major keys win here: enclosed scenes' candidate sets are
        # origin-driven (balanced 6D keys measured ~1.5x LONGER lists)
        keys = coherence_keys(o, d, wl, inv_ext)
        keys = jnp.where(t_arr > 0, keys, jnp.uint32(0xFFFFFFFF))
        perm = jax.lax.optimization_barrier(jnp.argsort(keys))
        packed = jnp.concatenate(
            [o, d, t_arr[:, None], jnp.zeros_like(t_arr)[:, None]], axis=1)[perm]
        o, d, t_arr = packed[:, 0:3], packed[:, 3:6], packed[:, 6]
    live = jnp.where(t_arr > 0, 1.0, 0.0)
    blocks, R, B = pack_rays(o, d, t_arr, live)
    # pad the ray streams to the packed length for the cull
    pad = B * PACKET - R
    if pad:
        o = jnp.concatenate([o, jnp.zeros((pad, 3), F32)])
        d = jnp.concatenate([d, jnp.ones((pad, 3), F32)])
        t_arr = jnp.concatenate([t_arr, jnp.full(pad, -1.0, F32)])
    lists, rank_cnt, overflow = packet_lists(sa.cl_lo, sa.cl_hi, o, d, t_arr)
    aabb = jnp.concatenate(
        [sa.cl_lo, sa.cl_hi, jnp.zeros((sa.cl_lo.shape[0], 2), F32)], axis=1)
    out = _run_lists(sa.cl_tab, aabb, blocks, lists, rank_cnt, any_hit, interpret)

    t = out[:, 0, :].reshape(-1)[:R]
    prim = out[:, 1, :].reshape(-1)[:R]
    b1 = out[:, 2, :].reshape(-1)[:R]
    b2 = out[:, 3, :].reshape(-1)[:R]

    # overflow packets: re-trace those rays through the wide-BVH kernel
    # (already sorted; sort=False keeps their order)
    any_over = jnp.any(overflow)
    over_ray = jnp.repeat(overflow, PACKET)[:R]

    def with_fallback():
        t_q = jnp.where(over_ray, t_arr[:R], -1.0)
        if any_hit:
            t_f, prim_f, hit_f = wide_intersect(
                sa, static, o[:R], d[:R], t_q, any_hit=True,
                interpret=interpret, sort=False)
            return (jnp.where(over_ray, jnp.where(hit_f, t_f, t_arr[:R]), t),
                    jnp.where(over_ray, jnp.where(hit_f, 1.0, -1.0), prim),
                    b1, b2)
        t_f, prim_f, hit_f, b1_f, b2_f = wide_intersect(
            sa, static, o[:R], d[:R], t_q, any_hit=False,
            interpret=interpret, sort=False)
        return (jnp.where(over_ray, jnp.where(hit_f, t_f, t_arr[:R]), t),
                jnp.where(over_ray, jnp.where(hit_f, prim_f.astype(F32), -1.0), prim),
                jnp.where(over_ray, b1_f, b1),
                jnp.where(over_ray, b2_f, b2))

    t, prim, b1, b2 = jax.lax.cond(
        any_over, with_fallback, lambda: (t, prim, b1, b2))

    res = [t, prim, b1, b2]
    if perm is not None:
        inv_p = jax.lax.optimization_barrier(jnp.argsort(perm))
        unsorted = jnp.stack(res, axis=1)[inv_p]
        res = [unsorted[:, j] for j in range(4)]
    t, prim, b1, b2 = res
    prim_i = prim.astype(jnp.int32)
    hit = prim_i >= 0
    t = jnp.where(hit, t, jnp.float32(jnp.inf))
    if any_hit:
        return t, prim_i, hit
    return t, prim_i, hit, b1, b2
