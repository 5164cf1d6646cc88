"""Per-ray sample streams for all sampler kinds.

Each sample value is a pure function of (pixel, sample_index, dimension,
seed) — the stateless decomposition of the reference's sampler objects
(src/core/sampler.rs; samplers/{random,stratified,zerotwosequence,halton,
sobol,maxmindist}.rs). Low-discrepancy kinds use the scrambled (0,2)-sequence
for the first dimension pairs and Cranley-Patterson-rotated radical inverses
for higher dimensions; the Halton/Sobol global-index enumeration
(halton.rs:120-156) is kept semantically (deterministic, stratified per
pixel) rather than bit-identically.
"""
from __future__ import annotations

import jax.numpy as jnp

from . import rng

F32 = jnp.float32

_LD_KINDS = ("zerotwosequence", "maxmindist", "sobol", "halton", "lowdiscrepancy")


def is_ld(kind: str) -> bool:
    return kind in _LD_KINDS


def sample_2d(kind: str, seed, pixel, sample_idx, dim, spp: int):
    """One 2D sample. dim may be a static int or a traced int32 (inside the
    rolled bounce loop); the Halton radical-inverse path needs a static base,
    so traced dims fall through to the hash-scrambled (0,2) family."""
    if kind == "halton" and not isinstance(dim, int):
        kind = "zerotwosequence"
    if kind in ("random", "stratified"):
        u1 = rng.uniform_1d(seed, pixel, sample_idx, 2 * dim)
        u2 = rng.uniform_1d(seed, pixel, sample_idx, 2 * dim + 1)
        if kind == "stratified" and isinstance(dim, int) and dim == 0:
            # jittered pixel strata (stratified.rs): arrange spp on a grid
            import math

            xs = int(math.floor(math.sqrt(spp)))
            xs = max(xs, 1)
            ys = max(spp // xs, 1)
            sx = (sample_idx % xs).astype(F32)
            sy = ((sample_idx // xs) % ys).astype(F32)
            u1 = (sx + u1) / xs
            u2 = (sy + u2) / ys
        return u1, u2
    if kind == "halton":
        # Cranley-Patterson rotated Halton: bases (2,3), (5,7), ... per dim pair
        b0 = min(2 * dim, len(rng.PRIMES) - 2)
        b1 = b0 + 1
        u1 = rng.radical_inverse(b0, sample_idx)
        u2 = rng.radical_inverse(b1, sample_idx)
        r1 = rng.u32_to_float(rng.hash_combine(seed, pixel, 2 * dim))
        r2 = rng.u32_to_float(rng.hash_combine(seed, pixel, 2 * dim + 1))
        u1 = u1 + r1
        u2 = u2 + r2
        return jnp.where(u1 >= 1.0, u1 - 1.0, u1), jnp.where(u2 >= 1.0, u2 - 1.0, u2)
    # (0,2)-sequence family: per-(pixel, dim-pair) scramble, index = sample
    s1 = rng.hash_combine(seed, pixel, 2 * dim)
    s2 = rng.hash_combine(seed, pixel, 2 * dim + 1)
    u1, u2 = rng.sample_02(sample_idx, s1, s2)
    return u1, u2


def sample_1d(kind: str, seed, pixel, sample_idx, dim, spp: int):
    if kind == "halton" and not isinstance(dim, int):
        kind = "zerotwosequence"
    if kind in ("random", "stratified"):
        return rng.uniform_1d(seed, pixel, sample_idx, 1024 + dim)
    if kind == "halton":
        b = min(dim, len(rng.PRIMES) - 1)
        u = rng.radical_inverse(b, sample_idx)
        r = rng.u32_to_float(rng.hash_combine(seed, pixel, 4096 + dim))
        u = u + r
        return jnp.where(u >= 1.0, u - 1.0, u)
    s = rng.hash_combine(seed, pixel, 4096 + dim)
    return rng.van_der_corput(sample_idx, s)
