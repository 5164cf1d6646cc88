"""Pallas TPU wide-BVH traversal kernels.

The XLA packet traversal (intersect.py:_traverse) pays a ~60us floor per
`while_loop` iteration (kernel-boundary overhead) and per-lane gather costs;
here the whole traversal runs INSIDE one Pallas kernel: per-packet traversal
state in SMEM, node/prim tables resident in VMEM (built by scene/widebvh.py),
and every box/triangle test shaped (8, PACKET) — multiples of the native
(8, 128) VPU tile.

Per-visit cost engineering (measured on v5e; Mosaic constraints in
parentheses):
- entities are selected from their 128-aligned (8, 128) block with an 8-way
  static-slice `lax.switch` (dynamic lane offsets must be 128-aligned);
- interior (8-child box test) and leaf (8-triangle watertight test) phases
  are PREDICATED on the popped entry's type via `pl.when` — the type is
  packet-uniform (one shared stack), so each iteration runs exactly one
  phase instead of both;
- vector->scalar transfers cost ~90ns each (the dominant per-visit cost),
  so the kernel does exactly one per pop (the child-meta extract) plus one
  per interior push (the hit-mask). Per-packet constants (direction
  majorities) are hoisted; the visited node's split axis rides inside the
  meta value (bits 21-22) instead of being re-read from vector memory;
- best-hit state (t_best, slot) and the stack pointer live in VMEM/SMEM
  scratch refs so the predicated phases update them in place; `sp` is also
  mirrored through the while_loop carry for the loop condition;
- each grid step processes GRID_G packets in an inner loop: a grid step
  whose body is a data-dependent while_loop cannot be software-pipelined,
  costing ~13us of fixed overhead — batching packets amortizes it.

Ray coherence: packets share ONE stack, so a packet's cost is the union of
its lanes' traversal paths. `wide_intersect(sort=True)` sorts rays by
direction octant + origin Morton code before packetizing (one packed row
gather each way; argsort itself is ~1ms per 500k rays) — measured 1.7x on
incoherent bounce waves.

Semantic reference: src/accelerators/bvh.rs:705-814 (stack traversal with
dir-sign child ordering); triangle test = the watertight shear test of
triangle.rs:136-399 (per-ray permutation/shear constants precomputed in
pack_rays) so shared-edge hits can never fall through a crack, matching the
XLA path (intersect.ray_triangle). The kernel returns (t, slot);
barycentrics are recomputed by the XLA wrapper on the single hit prim.

Negative result (measured, do not retry without new ideas): a "mini-tree
forest" design — cut the BVH into <=1024-tri subtrees, dense-cull every
256-ray block against all subtree AABBs (pure VPU), then stream each hit
subtree's 64 leaf boxes + one-hot-matmul triangle fetches through a
scalar-prefetched grid with per-LANE (stackless) leaf walks — was built and
benchmarked on the 123k-tri terrain scene.  Despite eliminating all
per-visit scalar serialization and packet-union waste inside subtrees, it
reached only ~4.7 Mrays/s on pixel-coherent rays vs 9.1 for this kernel
(and 21% of blocks overflowed the per-block subtree cap, requiring a packet
fallback pass).  The dense 64-leaf sweep + per-round 176x128x256 matmul
fetch costs more than the scalar pops it saves; the scheme also needs
K-nearest subtree selection glue in XLA whose cost scales with S.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

F32 = jnp.float32
I32 = jnp.int32
PACKET = 256
GRID_G = 8  # packets per grid step
STACK = 72  # >= wide-tree depth (~8 for 1M prims) x safety; slot STACK-1 is sacrificial
EPS = 1e-4  # matches intersect.SHADOW_EPS


def _low_bit_index(m):
    """Index of the lowest set bit of 8-bit m (scalar, branch-free)."""
    low = m & (-m)
    k = jnp.where((low & 0xAA) != 0, 1, 0)
    k = k + jnp.where((low & 0xCC) != 0, 2, 0)
    return k + jnp.where((low & 0xF0) != 0, 4, 0)


def _high_bit_index(m):
    """Index of the highest set bit of 8-bit m (scalar, branch-free)."""
    k4 = jnp.where((m & 0xF0) != 0, 4, 0)
    m1 = jnp.where(k4 > 0, m >> 4, m) & 0xF
    k2 = jnp.where((m1 & 0xC) != 0, 2, 0)
    m2 = jnp.where(k2 > 0, m1 >> 2, m1) & 0x3
    return k4 + k2 + jnp.where((m2 & 0x2) != 0, 1, 0)


def _traverse_kernel(*refs, root: int, any_hit: bool, smem_meta: bool):
    """Dispatch over the two stack layouts (see _traverse_kernel_impl).

    smem_meta=True: child metas live in an SMEM int32 sidetable read with
    scalar loads at pop time, and the stack entry packs (parent node id |
    mask | dir) — no VMEM vstack and no per-pop vector->scalar transfer
    (~90ns of the ~250ns visit). Gated by table size (SMEM is small).
    """
    if smem_meta:
        meta_ref, nodes_ref, prims_ref, rays_ref, out_ref, stack_ref, sp_ref, best_ref = refs
        vstack_ref = None
    else:
        nodes_ref, prims_ref, rays_ref, out_ref, stack_ref, vstack_ref, sp_ref, best_ref = refs
        meta_ref = None
    _traverse_kernel_impl(nodes_ref, prims_ref, rays_ref, out_ref, stack_ref,
                          vstack_ref, sp_ref, best_ref, meta_ref,
                          root=root, any_hit=any_hit)


def _traverse_kernel_impl(nodes_ref, prims_ref, rays_ref, out_ref,
                          stack_ref, vstack_ref, sp_ref, best_ref, meta_ref,
                          *, root: int, any_hit: bool):
    """GRID_G packets (PACKET rays each) against the wide BVH.

    rays_ref block (GRID_G, 16, PACKET): rows 0-2 o, 3-5 d, 6-8 shear
    consts, 9 t_max, 10-12 per-packet majority sign of d (broadcast),
    13 live mask, 14/15 watertight permutation flags.
    out block (GRID_G, 8, PACKET): row 0 t_best, row 1 slot (f32, -1=miss).
    stack_ref: (STACK,) SMEM i32 entries = hit-children mask | dir << 8.
    vstack_ref: (STACK*8, 128) VMEM f32; col 0 of group s = child metas of
    the stack entry at slot s (meta > 0 packed interior id | axis << 21,
    < 0 -(octet+1)). sp_ref: (1,) SMEM stack pointer.
    best_ref: (8, PACKET) VMEM scratch, row 0 = t_best, row 1 = slot.
    """
    iota16 = jax.lax.broadcasted_iota(I32, (16, PACKET), 0)
    iota8c = jax.lax.broadcasted_iota(I32, (8, 1), 0)
    pw2 = (1 << iota8c).astype(F32)  # (8,1): 1,2,4,...

    def _sel16(blk, j):
        """Static-slice 16-lane group select via an 8-way scalar branch."""
        return jax.lax.switch(j, tuple(
            (lambda ss: (lambda: blk[:, ss * 16:(ss + 1) * 16]))(sl) for sl in range(8)
        ))

    def run_packet(g, _):
        rr = rays_ref[g]
        ox, oy, oz = rr[0:1, :], rr[1:2, :], rr[2:3, :]
        # rows 3-5 hold 1/d, precomputed by pack_rays (host side)
        ix, iy, iz = rr[3:4, :], rr[4:5, :], rr[5:6, :]
        sx, sy, sz = rr[6:7, :], rr[7:8, :], rr[8:9, :]
        t_max = rr[9:10, :]
        live = rr[13:14, :] > 0
        k0 = rr[14:15, :] > 0  # watertight permutation: max |d| axis == x
        k1 = rr[15:16, :] > 0  # == y

        # per-packet majority sign of d per axis, hoisted to scalars once
        m0 = jnp.sum(rr[10:11, 0:1])
        m1 = jnp.sum(rr[11:12, 0:1])
        m2f = jnp.sum(rr[12:13, 0:1])

        # seed: a one-child group holding the (packed) root meta
        if meta_ref is None:
            stack_ref[0] = 1  # mask = bit 0, dir = 0
            vstack_ref[pl.ds(0, 8), 0:1] = jnp.where(iota8c == 0, jnp.float32(root), 0.0)
        else:
            # parent 0 (sentinel) slot 0 holds the root meta in the SMEM table
            stack_ref[0] = (0 << 9) | (1 << 1) | 0
        sp_ref[0] = 1
        best_ref[0:1, :] = t_max
        best_ref[1:2, :] = jnp.full((1, PACKET), -1.0, F32)
        if not any_hit:
            best_ref[2:3, :] = jnp.full((1, PACKET), -1.0, F32)  # prim row
            best_ref[3:5, :] = jnp.zeros((2, PACKET), F32)  # b1, b2

        # sp is mirrored through the loop carry: a cond() that reads the
        # SMEM ref directly never observes the predicated-phase updates in
        # interpret mode (the carried value costs nothing compiled). The
        # iteration cap is a safety valve only. (A software-pipelined
        # "process previous entry while popping the next" variant was
        # measured 8% SLOWER — Mosaic does not overlap the scalar extract
        # with the vector phases, and the one-behind order weakens
        # t-pruning — so the straightforward pop-then-process order stays.)
        def cond(state):
            it, sp = state
            return (sp > 0) & (it < 1_000_000)

        def body(state):
            it, _sp_in = state
            sp = sp_ref[0]
            top = stack_ref[sp - 1]
            if meta_ref is None:
                m = top & 255
                dirb = top >> 8
            else:
                dirb = top & 1
                m = (top >> 1) & 255
                pn = top >> 9
            k = jnp.where(dirb > 0, _high_bit_index(m), _low_bit_index(m))
            m2 = m & (~(1 << k))
            if meta_ref is None:
                stack_ref[sp - 1] = m2 | (dirb << 8)
            else:
                stack_ref[sp - 1] = (pn << 9) | (m2 << 1) | dirb
            sp_pop = jnp.where(m2 == 0, sp - 1, sp)
            sp_ref[0] = sp_pop

            if meta_ref is None:
                # this child's meta, from the vstack group of the popped slot
                mv = vstack_ref[pl.ds((sp - 1) * 8, 8), 0:1]  # (8,1)
                e = jnp.sum(jnp.where(iota8c == k, mv, 0.0)).astype(I32)
            else:
                # scalar SMEM load — no vector->scalar transfer
                e = meta_ref[pn * 8 + k]
            is_int = e > 0

            @pl.when(is_int)
            def _interior():
                nid = e & 0x1FFFFF  # low 21 bits; axis rides in bits 21-22
                axis_i = e >> 21
                t_best = best_ref[0:1, :]
                nblk = nodes_ref[pl.ds((nid // 8) * 8, 8), :]
                nsub = _sel16(nblk, nid % 8)
                t0x = (nsub[:, 0:1] - ox) * ix
                t1x = (nsub[:, 3:4] - ox) * ix
                t0y = (nsub[:, 1:2] - oy) * iy
                t1y = (nsub[:, 4:5] - oy) * iy
                t0z = (nsub[:, 2:3] - oz) * iz
                t1z = (nsub[:, 5:6] - oz) * iz
                tn = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
                                 jnp.minimum(t0z, t1z))
                tf = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
                                 jnp.maximum(t0z, t1z)) * 1.0000004
                bhit = (tn <= tf) & (tf > 0) & (tn < t_best)
                # empty child slots (meta == 0) must never enter the mask:
                # their NaN boxes compare false under IEEE, but TPU vmin/vmax
                # may drop NaNs, so gate on the meta explicitly
                meta_col = nsub[:, 6:7]
                anyc = jnp.max(jnp.where(bhit, 1.0, 0.0), axis=1, keepdims=True) * \
                    jnp.where(meta_col != 0, 1.0, 0.0)
                if meta_ref is None:
                    meta_hit = anyc * meta_col
                mask_new = jnp.sum(anyc * pw2).astype(I32)

                # direction bit: children ascend along `axis`;
                # majority-negative d consumes highest-first
                # (bvh.rs:705-760 dir-sign ordering)
                maj = jnp.where(axis_i == 0, m0, jnp.where(axis_i == 1, m1, m2f))
                dir_new = jnp.where(maj > 0, 0, 1)

                # branch-free push: non-pushes land in the sacrificial slot
                do_push = mask_new != 0
                wslot = jnp.where(do_push, sp_pop, STACK - 1)
                if meta_ref is None:
                    vstack_ref[pl.ds(wslot * 8, 8), 0:1] = meta_hit
                    stack_ref[wslot] = mask_new | (dir_new << 8)
                else:
                    stack_ref[wslot] = (nid << 9) | (mask_new << 1) | dir_new
                sp_ref[0] = sp_pop + jnp.where(do_push, 1, 0)

            @pl.when(jnp.logical_not(is_int))
            def _leaf():
                t_best = best_ref[0:1, :]
                o_ = jnp.maximum(-e - 1, 0)  # first octet of the pair (even)
                pblk = prims_ref[pl.ds((o_ // 8) * 8, 8), :]
                # o_ is even, so o_ and o_+1 share the same 8 block rows
                psub = jnp.concatenate(
                    [_sel16(pblk, o_ % 8), _sel16(pblk, o_ % 8 + 1)], axis=0
                )  # (16, 16): both octets stacked on the sublane axis
                valid = psub[:, 9:10] > 0
                pid_col = psub[:, 10:11]  # global prim row per sublane

                def _shear(j):
                    # translate vert j to ray origin, permute by kz, shear
                    vx = psub[:, 3 * j:3 * j + 1] - ox
                    vy = psub[:, 3 * j + 1:3 * j + 2] - oy
                    vz = psub[:, 3 * j + 2:3 * j + 3] - oz
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
                # the 1e30 miss sentinel must never count as an improvement:
                # with t_max = inf (closest-hit queries), `tmin < t_best`
                # alone turns every visited leaf into a phantom hit
                improved = tmin < jnp.minimum(t_best, jnp.float32(1e29))
                # octets are consecutive, so slots o_*8 .. o_*8+15 are one run
                slotf = (o_ * 8 + iota16).astype(F32)
                snew = jnp.max(jnp.where(tc == tmin, slotf, -1.0), axis=0, keepdims=True)
                best_ref[0:1, :] = jnp.where(improved, tmin, t_best)
                best_ref[1:2, :] = jnp.where(improved, snew, best_ref[1:2, :])

                if not any_hit:
                    # winner sublane (max slot among t ties, matching snew)
                    win = (tc == tmin) & (slotf == snew)
                    prim_new = jnp.sum(jnp.where(win, pid_col, 0.0), axis=0, keepdims=True)
                    b1_new = jnp.sum(jnp.where(win, e1_ * inv, 0.0), axis=0, keepdims=True)
                    b2_new = jnp.sum(jnp.where(win, e2_ * inv, 0.0), axis=0, keepdims=True)
                    best_ref[2:3, :] = jnp.where(improved, prim_new, best_ref[2:3, :])
                    best_ref[3:4, :] = jnp.where(improved, b1_new, best_ref[3:4, :])
                    best_ref[4:5, :] = jnp.where(improved, b2_new, best_ref[4:5, :])

                if any_hit:
                    # stop once every live lane has an occluder
                    missing = jnp.max(jnp.where(live & (best_ref[1:2, :] < 0), 1.0, 0.0))
                    sp_ref[0] = jnp.where(missing > 0, sp_ref[0], 0)

            return it + 1, sp_ref[0]

        it_fin, _ = jax.lax.while_loop(cond, body, (jnp.int32(0), jnp.int32(1)))
        out_ref[g, 0:1, :] = best_ref[0:1, :]
        out_ref[g, 1:2, :] = best_ref[1:2, :]
        if not any_hit:
            out_ref[g, 2:5, :] = best_ref[2:5, :]
        # row 5: per-packet pop (visit) count, broadcast to all lanes —
        # feeds the bvh node-visit stats and ns/pop calibration
        out_ref[g, 5:6, :] = jnp.full((1, PACKET), 1.0, F32) * it_fin.astype(F32)
        return 0

    jax.lax.fori_loop(0, GRID_G, run_packet, 0)


def _traverse_kernel_joint(meta_ref, nodes_ref, prims_ref, rays_ref, out_ref,
                           stack_ref, sp_ref, dirb_ref, pops_ref, best_ref,
                           *, root: int, any_hit: bool):
    """All GRID_G packets advance in ONE while_loop, one pop each per
    iteration, with a fully BRANCHLESS body.

    The legacy kernel (below) runs packets sequentially, so each pop pays
    the full latency of its serial dependency chain: stack pop -> SMEM meta
    load -> VMEM node fetch -> VPU box/triangle phase -> mask vector->scalar
    transfer -> stack push. Measured ~450-580ns per pop on v5e — latency,
    not throughput (a microbenchmark of the same chain shape shows 8
    interleaved independent straight-line chains run at ~0.6ns/chain-step
    vs 8.6 for one). A first interleaved variant that kept the
    pl.when(interior)/pl.when(leaf) phase predication measured NO gain
    (~450ns/pop still): the scalar branches order the regions and defeat
    VLIW interleaving of the chains. So this kernel executes BOTH phases
    for EVERY packet every iteration with masked effects — ~2x the vector
    flops of the predicated form, but the vector units were idle waiting on
    chain latency anyway, and the straight-line body lets the scheduler
    overlap all GRID_G chains.

    Per-packet traversal order and results are IDENTICAL to the legacy
    kernel. Packets that finish early keep executing with effects masked
    (their pops are not counted); the loop ends when every packet's stack
    is empty.

    Only the SMEM-meta stack layout is supported here: stack entries pack
    (parent node id | child mask | dir), child metas come from scalar SMEM
    loads. Trees whose meta table exceeds SMEM_META_MAX_BYTES use the
    legacy VMEM-vstack kernel.

    Scratch: stack_ref (GRID_G*STACK,) SMEM; sp_ref/dirb_ref/pops_ref
    (GRID_G,) SMEM; best_ref (GRID_G*8, PACKET) VMEM (rows g*8+0..4 = t,
    slot, prim, b1, b2).
    """
    iota16 = jax.lax.broadcasted_iota(I32, (16, PACKET), 0)
    iota8c = jax.lax.broadcasted_iota(I32, (8, 1), 0)
    pw2 = (1 << iota8c).astype(F32)
    n_node_rows = nodes_ref.shape[0]
    n_prim_rows = prims_ref.shape[0]

    def _sel16(blk, j):
        return jax.lax.switch(j, tuple(
            (lambda ss: (lambda: blk[:, ss * 16:(ss + 1) * 16]))(sl) for sl in range(8)
        ))

    # ---- per-packet init ----
    for g in range(GRID_G):
        rr = rays_ref[g]
        stack_ref[g * STACK] = (0 << 9) | (1 << 1) | 0  # sentinel parent 0, child 0 = root
        sp_ref[g] = 1
        pops_ref[g] = 0
        b = g * 8
        best_ref[b:b + 1, :] = rr[9:10, :]  # t_max
        best_ref[b + 1:b + 2, :] = jnp.full((1, PACKET), -1.0, F32)
        if not any_hit:
            best_ref[b + 2:b + 3, :] = jnp.full((1, PACKET), -1.0, F32)
            best_ref[b + 3:b + 5, :] = jnp.zeros((2, PACKET), F32)
        # per-packet majority-direction bits, packed b0|b1<<1|b2<<2
        neg0 = jnp.sum(rr[10:11, 0:1]) < 0
        neg1 = jnp.sum(rr[11:12, 0:1]) < 0
        neg2 = jnp.sum(rr[12:13, 0:1]) < 0
        dirb_ref[g] = (neg0.astype(I32) | (neg1.astype(I32) << 1)
                       | (neg2.astype(I32) << 2))

    def cond(state):
        it, alive = state
        return (alive > 0) & (it < 1_000_000)

    def body(state):
        it, _ = state
        for g in range(GRID_G):
            rr = rays_ref[g]
            b = g * 8
            base = g * STACK

            sp = sp_ref[g]
            alive = sp > 0
            pops_ref[g] = pops_ref[g] + jnp.where(alive, 1, 0)
            spc = jnp.maximum(sp, 1)
            top = stack_ref[base + spc - 1]
            dirb = top & 1
            m = (top >> 1) & 255
            pn = top >> 9
            k = jnp.where(dirb > 0, _high_bit_index(m), _low_bit_index(m))
            m2 = m & (~(1 << k))
            # consume child k from the top entry (dead packets write the
            # sacrificial slot so their stale slot 0 stays untouched)
            wtop = jnp.where(alive, base + spc - 1, base + STACK - 1)
            stack_ref[wtop] = (pn << 9) | (m2 << 1) | dirb
            sp_pop = jnp.where(m2 == 0, spc - 1, spc)

            # stale/dead entries index within-table (entries only ever hold
            # real node ids), so the meta load is safe without a clamp
            e = meta_ref[pn * 8 + k]
            is_int = alive & (e > 0)
            is_leaf = alive & (e < 0)

            # ---- interior phase (always executed, effects masked) ----
            ox, oy, oz = rr[0:1, :], rr[1:2, :], rr[2:3, :]
            ix, iy, iz = rr[3:4, :], rr[4:5, :], rr[5:6, :]
            t_best = best_ref[b:b + 1, :]
            nid = e & 0x1FFFFF
            axis_i = e >> 21
            nrow = jnp.minimum((nid // 8) * 8, n_node_rows - 8)
            nblk = nodes_ref[pl.ds(nrow, 8), :]
            nsub = _sel16(nblk, nid % 8)
            t0x = (nsub[:, 0:1] - ox) * ix
            t1x = (nsub[:, 3:4] - ox) * ix
            t0y = (nsub[:, 1:2] - oy) * iy
            t1y = (nsub[:, 4:5] - oy) * iy
            t0z = (nsub[:, 2:3] - oz) * iz
            t1z = (nsub[:, 5:6] - oz) * iz
            tn = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
                             jnp.minimum(t0z, t1z))
            tf = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
                             jnp.maximum(t0z, t1z)) * 1.0000004
            bhit = (tn <= tf) & (tf > 0) & (tn < t_best)
            meta_col = nsub[:, 6:7]
            anyc = jnp.max(jnp.where(bhit, 1.0, 0.0), axis=1, keepdims=True) * \
                jnp.where(meta_col != 0, 1.0, 0.0)
            mask_new = jnp.sum(anyc * pw2).astype(I32)
            dir_new = (dirb_ref[g] >> axis_i) & 1
            do_push = is_int & (mask_new != 0)
            wslot = jnp.where(do_push, base + sp_pop, base + STACK - 1)
            stack_ref[wslot] = (nid << 9) | (mask_new << 1) | dir_new

            # ---- leaf phase (always executed, effects masked) ----
            sx, sy, sz = rr[6:7, :], rr[7:8, :], rr[8:9, :]
            k0 = rr[14:15, :] > 0
            k1 = rr[15:16, :] > 0
            o_ = jnp.maximum(-e - 1, 0)
            prow = jnp.minimum((o_ // 8) * 8, n_prim_rows - 8)
            pblk = prims_ref[pl.ds(prow, 8), :]
            psub = jnp.concatenate(
                [_sel16(pblk, o_ % 8), _sel16(pblk, o_ % 8 + 1)], axis=0
            )
            valid = psub[:, 9:10] > 0
            pid_col = psub[:, 10:11]

            def _shear(j, psub=psub, ox=ox, oy=oy, oz=oz, sx=sx, sy=sy, sz=sz, k0=k0, k1=k1):
                vx = psub[:, 3 * j:3 * j + 1] - ox
                vy = psub[:, 3 * j + 1:3 * j + 2] - oy
                vz = psub[:, 3 * j + 2:3 * j + 3] - oz
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
            tmin = jnp.min(tc, axis=0, keepdims=True)
            improved = is_leaf & (tmin < jnp.minimum(t_best, jnp.float32(1e29)))
            slotf = (o_ * 8 + iota16).astype(F32)
            snew = jnp.max(jnp.where(tc == tmin, slotf, -1.0), axis=0, keepdims=True)
            best_ref[b:b + 1, :] = jnp.where(improved, tmin, t_best)
            best_ref[b + 1:b + 2, :] = jnp.where(improved, snew, best_ref[b + 1:b + 2, :])

            if not any_hit:
                win = (tc == tmin) & (slotf == snew)
                prim_new = jnp.sum(jnp.where(win, pid_col, 0.0), axis=0, keepdims=True)
                b1_new = jnp.sum(jnp.where(win, e1_ * inv, 0.0), axis=0, keepdims=True)
                b2_new = jnp.sum(jnp.where(win, e2_ * inv, 0.0), axis=0, keepdims=True)
                best_ref[b + 2:b + 3, :] = jnp.where(improved, prim_new, best_ref[b + 2:b + 3, :])
                best_ref[b + 3:b + 4, :] = jnp.where(improved, b1_new, best_ref[b + 3:b + 4, :])
                best_ref[b + 4:b + 5, :] = jnp.where(improved, b2_new, best_ref[b + 4:b + 5, :])

            sp_new = jnp.where(alive, sp_pop + jnp.where(do_push, 1, 0), 0)
            if any_hit:
                # stop once every live lane has an occluder (only leaf
                # visits can change this)
                live = rr[13:14, :] > 0
                missing = jnp.max(jnp.where(live & (best_ref[b + 1:b + 2, :] < 0), 1.0, 0.0))
                sp_new = jnp.where(is_leaf & (missing == 0), 0, sp_new)
            sp_ref[g] = sp_new

        alive = sp_ref[0]
        for g in range(1, GRID_G):
            alive = alive + sp_ref[g]
        return it + 1, alive

    jax.lax.while_loop(cond, body, (jnp.int32(0), jnp.int32(1)))
    for g in range(GRID_G):
        b = g * 8
        out_ref[g, 0:1, :] = best_ref[b:b + 1, :]
        out_ref[g, 1:2, :] = best_ref[b + 1:b + 2, :]
        if not any_hit:
            out_ref[g, 2:5, :] = best_ref[b + 2:b + 5, :]
        out_ref[g, 5:6, :] = jnp.full((1, PACKET), 1.0, F32) * pops_ref[g].astype(F32)



# SMEM child-meta sidetable budget: the whole (n_nodes*8,) i32 table must
# fit comfortably in scalar memory next to the stack. v5e SMEM holds at
# least ~1MB (a 111KB table compiles and runs with headroom); 384KB covers
# wide trees up to ~500k triangles, beyond which the legacy VMEM-vstack
# kernel takes over.
SMEM_META_MAX_BYTES = 384 * 1024


_JOINT_PROBE = {"ok": None}


def _in_trace() -> bool:
    """True when called under an active jax trace (jit/make_jaxpr/...)."""
    try:
        from jax._src import core as _jcore

        return not _jcore.trace_state_clean()
    except Exception:  # API drift: fall back to probing a fresh array
        return isinstance(jnp.zeros(()), jax.core.Tracer)


def _joint_probe():
    """One-time compile+run of the joint kernel on a 2-triangle tree.

    The joint kernel's 8x-unrolled branchless body stresses Mosaic
    (registers/VMEM) far more than the sequential kernel; if the backend
    rejects it, renders silently fall back to the sequential SMEM kernel
    instead of dying inside the wave jit.

    MUST run eagerly (host-side, outside any trace): an earlier version
    wrapped the probe in `jax.ensure_compile_time_eval()` so it could fire
    from inside the wave jit, but that context constant-folds every value
    of the kernel trace into captured ndarray constants, which Mosaic
    rejects ("captures constants ... pass them as inputs") — the round-1
    regression that silently pinned all mesh renders to the sequential
    kernel. Scene compile (scene/builder.py) now triggers the probe
    eagerly whenever wide tables are built; if the first call still lands
    inside a trace, report False for that trace WITHOUT caching so a later
    eager call can succeed.
    """
    if _JOINT_PROBE["ok"] is None:
        if _in_trace():
            return False  # uncached: decided for this trace only
        try:
            import numpy as np

            from ..scene.widebvh import build_wide_bvh

            tri = np.array([[[0, 0, 0], [1, 0, 0], [0, 1, 0]],
                            [[0, 0, 1], [1, 0, 1], [0, 1, 1]]], np.float32)
            w = build_wide_bvh(tri.min(axis=1), tri.max(axis=1),
                               tri[:, 0], tri[:, 1], tri[:, 2])
            o = jnp.zeros((PACKET * GRID_G, 3), F32) + jnp.asarray([0.3, 0.3, -1.0])
            d = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0], F32), (PACKET * GRID_G, 3))
            blocks, _R, _B = pack_rays(o, d, jnp.full(PACKET * GRID_G, 1e30, F32))
            interp = jax.default_backend() == "cpu"
            out = _run(jnp.asarray(w.node_tab), jnp.asarray(w.prim_tab), blocks,
                       w.root, False, interp, meta=jnp.asarray(w.meta_tab), joint=True)
            jax.block_until_ready(out)
            _JOINT_PROBE["ok"] = bool(out[0, 1, 0] >= 0)  # ray 0 must hit
        except Exception as e:  # pragma: no cover - backend-specific
            import logging

            logging.getLogger(__name__).warning(
                "joint traversal kernel unavailable (%s); using sequential SMEM kernel", e)
            _JOINT_PROBE["ok"] = False
    return _JOINT_PROBE["ok"]


def _joint_enabled():
    import os

    # default: SEQUENTIAL. The round-3 A/B (tools/trav_bench.py on the
    # 123k-tri bench, sorted e2e) measured seq 4.29/1.14/1.03 Mrays/s
    # (camera/incoherent/anyhit) vs joint 2.57/0.54/0.47 — the joint
    # kernel's latency-hiding layout loses ~2x across the board on the
    # current toolchain. PBRT_TPU_JOINT=1 opts back in for A/Bs.
    if os.environ.get("PBRT_TPU_JOINT", "0") != "1":
        return False
    return _joint_probe()


@functools.partial(jax.jit, static_argnames=("root", "any_hit", "interpret", "joint"))
def _run(nodes, prims, rays, root, any_hit, interpret, meta=None, joint=True):
    B = rays.shape[0]
    assert B % GRID_G == 0
    smem_meta = meta is not None
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec((GRID_G, 16, PACKET), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
    ]
    if smem_meta and joint:
        # joint kernel: all GRID_G packets interleaved in one while_loop
        kernel = functools.partial(_traverse_kernel_joint, root=root, any_hit=any_hit)
        in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)] + in_specs
        scratch = [
            pltpu.SMEM((GRID_G * STACK,), jnp.int32),
            pltpu.SMEM((GRID_G,), jnp.int32),
            pltpu.SMEM((GRID_G,), jnp.int32),
            pltpu.SMEM((GRID_G,), jnp.int32),
            pltpu.VMEM((GRID_G * 8, PACKET), F32),
        ]
        args = (meta, nodes, prims, rays)
    elif smem_meta:
        # sequential per-packet kernel, SMEM-meta stack layout
        # (PBRT_TPU_JOINT=0 A/B path)
        kernel = functools.partial(_traverse_kernel, root=root, any_hit=any_hit,
                                   smem_meta=True)
        in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)] + in_specs
        scratch = [
            pltpu.SMEM((STACK,), jnp.int32),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.VMEM((8, PACKET), F32),
        ]
        args = (meta, nodes, prims, rays)
    else:
        kernel = functools.partial(_traverse_kernel, root=root, any_hit=any_hit,
                                   smem_meta=False)
        scratch = [
            pltpu.SMEM((STACK,), jnp.int32),
            pltpu.VMEM((STACK * 8, 128), F32),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.VMEM((8, PACKET), F32),
        ]
        args = (nodes, prims, rays)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, 8, PACKET), F32),
        grid=(B // GRID_G,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((GRID_G, 8, PACKET), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        scratch_shapes=scratch,
        interpret=interpret,
    )(*args)


def pack_rays(o, d, t_max, live=None):
    """(R, 3) rays -> (B, 16, PACKET) packet blocks (R padded to PACKET)."""
    R = o.shape[0]
    B = (R + PACKET - 1) // PACKET
    B = ((B + GRID_G - 1) // GRID_G) * GRID_G  # whole grid steps
    pad = B * PACKET - R

    def padto(x, fill):
        if pad == 0:
            return x
        return jnp.concatenate([x, jnp.full((pad,) + x.shape[1:], fill, x.dtype)], 0)

    o_p = padto(o, 0.0)
    d_p = padto(d, 1.0)
    tm = padto(jnp.broadcast_to(jnp.asarray(t_max, F32), (R,)), -1.0)
    lv = padto(jnp.broadcast_to(jnp.asarray(1.0 if live is None else live, F32), (R,)), 0.0)
    dm = d_p.reshape(B, PACKET, 3)
    # per-packet majority sign of d per axis: > 0 means most lanes positive
    maj = jnp.where(jnp.sum(jnp.where(dm < 0, -1.0, 1.0), axis=1) >= 0, 1.0, -1.0)  # (B, 3)
    # watertight shear constants (triangle.rs permute + shear): kz = argmax
    # |d|; kx/ky cyclic; sx = -d_kx/d_kz, sy = -d_ky/d_kz, sz = 1/d_kz
    ad = jnp.abs(d_p)
    kz = jnp.argmax(ad, axis=-1)
    k0 = (kz == 0).astype(F32)
    k1 = (kz == 1).astype(F32)

    def _sel(i0, i1, i2):
        return jnp.where(kz == 0, d_p[:, i0], jnp.where(kz == 1, d_p[:, i1], d_p[:, i2]))

    dkx = _sel(1, 2, 0)
    dky = _sel(2, 0, 1)
    dkz = _sel(0, 1, 2)
    inv_dkz = 1.0 / jnp.where(jnp.abs(dkz) < 1e-30, jnp.where(dkz < 0, -1e-30, 1e-30), dkz)
    shear = jnp.stack([-dkx * inv_dkz, -dky * inv_dkz, inv_dkz], axis=1)  # (BP, 3)
    # assemble (B, 16, PACKET) directly: one reshape per attribute row
    # avoids a (B, PACKET, 16) minor-dim transpose, which lowers to slow
    # sublane/lane shuffles on TPU
    def row(x):
        return x.reshape(B, 1, PACKET)

    inv_d = 1.0 / jnp.where(jnp.abs(d_p) < 1e-30,
                            jnp.where(d_p < 0, -1e-30, 1e-30), d_p)
    blocks = jnp.concatenate(
        [row(o_p[:, 0]), row(o_p[:, 1]), row(o_p[:, 2]),
         row(inv_d[:, 0]), row(inv_d[:, 1]), row(inv_d[:, 2]),
         row(shear[:, 0]), row(shear[:, 1]), row(shear[:, 2]),
         row(tm),
         jnp.broadcast_to(maj[:, :, None], (B, 3, PACKET)),
         row(lv), row(k0), row(k1)], axis=1
    )  # (B, 16, PACKET)
    return blocks, R, B


def _morton10(q):
    """Interleave 10-bit ints (R, 3) -> 30-bit Morton codes (vector u32)."""
    def spread(v):
        v = (v | (v << 16)) & 0x030000FF
        v = (v | (v << 8)) & 0x0300F00F
        v = (v | (v << 4)) & 0x030C30C3
        v = (v | (v << 2)) & 0x09249249
        return v

    return spread(q[:, 0]) | (spread(q[:, 1]) << 1) | (spread(q[:, 2]) << 2)


def coherence_keys(o, d, world_lo, world_inv_extent):
    """Sort keys grouping rays by direction octant, origin locality, then
    direction locality.

    Layout (high to low): bit 31 reserved for the dead flag, bits 30..28
    direction octant, bits 27..12 origin Morton code (16 bits, ~5/axis),
    bits 11..0 direction Morton code (12 bits, 4/axis). The direction bits
    matter when origins coincide — camera rays all share the pinhole, so
    without them a stable argsort leaves packets as 1xPACKET raster strips
    instead of square pixel blocks (3-5x worse traversal unions)."""
    oc = ((d[:, 0] > 0).astype(jnp.uint32) * 4 +
          (d[:, 1] > 0).astype(jnp.uint32) * 2 +
          (d[:, 2] > 0).astype(jnp.uint32))
    q = jnp.clip(((o - world_lo) * world_inv_extent * 1024.0), 0.0, 1023.0).astype(jnp.uint32)
    qd = jnp.clip((jnp.abs(d) * 15.999), 0.0, 15.0).astype(jnp.uint32)
    dm = _morton10(qd)  # 12 useful bits for 4-bit axes
    return (oc << 28) | ((_morton10(q) >> 14) << 12) | (dm & 0xFFF)


def _traverse_wave(sa, static, o, d, t_max, any_hit, interpret, sort):
    """Shared coherence-sort + packetize + kernel dispatch for
    wide_intersect and wide_pop_counts (ONE implementation so the
    diagnostic pop counts always measure the production configuration).

    Returns (out (B, 8, PACKET), R, perm or None)."""
    t_arr = jnp.broadcast_to(jnp.asarray(t_max, F32), (o.shape[0],))
    perm = None
    if sort and o.shape[0] >= 2 * PACKET:
        lo = sa.world_center - sa.world_radius
        inv_ext = 1.0 / jnp.maximum(2.0 * sa.world_radius, 1e-20)
        keys = coherence_keys(o, d, lo, inv_ext)
        # dead lanes (t_max <= 0) sort to the back so whole packets retire
        keys = jnp.where(t_arr > 0, keys, jnp.uint32(0xFFFFFFFF))
        # barrier: keep the permutation's gathers on the fast lowering (see
        # gather.gather_rows)
        perm = jax.lax.optimization_barrier(jnp.argsort(keys))
        # permute o/d/t with ONE row gather of a packed (R, 8) matrix:
        # gathers cost per-row, so seven separate (R,) gathers are ~7x the
        # traffic of one packed one (measured ~80 Mrows/s either way)
        packed = jnp.concatenate([o, d, t_arr[:, None], jnp.zeros_like(t_arr)[:, None]], axis=1)
        packed = packed[perm]
        o = packed[:, 0:3]
        d = packed[:, 3:6]
        t_arr = packed[:, 6]
    live = jnp.where(t_arr > 0, 1.0, 0.0) if any_hit else None
    blocks, R, B = pack_rays(o, d, t_arr, live)
    meta = getattr(sa, "wmeta_tab", None)
    if meta is not None and meta.shape[0] * 4 > SMEM_META_MAX_BYTES:
        meta = None  # big trees keep the VMEM vstack path
    out = _run(sa.wnode_tab, sa.wprim_tab, blocks, static.wide_root, any_hit, interpret,
               meta=meta, joint=_joint_enabled())
    return out, R, perm


def wide_pop_counts(sa, static, o, d, t_max, any_hit=False, interpret=False, sort=True):
    """Per-packet traversal visit counts for the given wave (diagnostics:
    stats + ns/pop calibration). Returns (B,) f32 pop counts."""
    out, _R, _perm = _traverse_wave(sa, static, o, d, t_max, any_hit, interpret, sort)
    return out[:, 5, 0]


def wide_intersect(sa, static, o, d, t_max, any_hit=False, interpret=False, sort=True):
    """Closest-hit (or any-hit) against the wide BVH tables.

    any_hit: returns (t (R,), slot (R,) i32, hit (R,)) — slot indexes
    ``sa.wslot_prim``. Closest-hit: returns (t, prim (R,) i32 GLOBAL prim
    row, hit, b1, b2) — the kernel carries the winning prim id and
    barycentrics out of VMEM directly, so shading needs no slot->prim or
    re-intersection gathers. ``sort=True`` permutes rays into
    direction-octant + origin-Morton order before packetizing — packets
    share one traversal stack, so coherence directly sets throughput.
    """
    out, R, perm = _traverse_wave(sa, static, o, d, t_max, any_hit, interpret, sort)
    rows = 2 if any_hit else 5
    res = [out[:, j, :].reshape(-1)[:R] for j in range(rows)]
    if perm is not None:
        inv = jax.lax.optimization_barrier(jnp.argsort(perm))
        unsorted = jnp.stack(res, axis=1)[inv]
        res = [unsorted[:, j] for j in range(rows)]
    t = res[0]
    if any_hit:
        slot = res[1].astype(jnp.int32)
        hit = slot >= 0
        return jnp.where(hit, t, jnp.float32(jnp.inf)), slot, hit
    prim = res[2].astype(jnp.int32)
    hit = prim >= 0
    return jnp.where(hit, t, jnp.float32(jnp.inf)), prim, hit, res[3], res[4]
