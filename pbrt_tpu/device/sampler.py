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

import numpy as np

import jax.numpy as jnp

from . import rng

F32 = jnp.float32

_LD_KINDS = ("zerotwosequence", "maxmindist", "sobol", "halton", "lowdiscrepancy")


def is_ld(kind: str) -> bool:
    return kind in _LD_KINDS


def sobol_dim(sample_idx, dim: int, scramble):
    """Sobol' sample of dimension `dim` at index `sample_idx`, XOR-scrambled.

    Generator matrices come from core/sobolmat.py (algorithmic equivalent of
    sobolmatrices.rs); the 32 column XORs unroll into pure vector ops."""
    from ..core.sobolmat import matrix

    cols = matrix(dim)
    idxu = jnp.asarray(sample_idx).astype(jnp.uint32)
    res = jnp.broadcast_to(jnp.asarray(scramble, jnp.uint32), idxu.shape)
    for j in range(32):
        c = int(cols[j])
        if c == 0:
            continue
        res = res ^ jnp.where(((idxu >> j) & jnp.uint32(1)) > 0, jnp.uint32(c), jnp.uint32(0))
    return rng.u32_to_float(res)


def sample_2d(kind: str, seed, pixel, sample_idx, dim, spp: int):
    """One 2D sample. dim may be a static int or a traced int32 (inside the
    rolled bounce loop); the Halton radical-inverse path needs a static base,
    so traced dims fall through to the hash-scrambled (0,2) family."""
    if kind in ("halton", "sobol") and not isinstance(dim, int):
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
    if kind == "sobol":
        # true Sobol' dims (2*dim, 2*dim+1) over algorithmically-derived
        # generator matrices (core/sobolmat.py; sobol.rs + sobolmatrices.rs),
        # XOR-scrambled per pixel (Kollig-Keller — preserves the net props)
        s1 = rng.hash_combine(seed, pixel, jnp.uint32(2 * dim))
        s2 = rng.hash_combine(seed, pixel, jnp.uint32(2 * dim + 1))
        return sobol_dim(sample_idx, 2 * dim, s1), sobol_dim(sample_idx, 2 * dim + 1, s2)
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
    if kind in ("halton", "sobol") and not isinstance(dim, int):
        kind = "zerotwosequence"
    if kind in ("random", "stratified"):
        return rng.uniform_1d(seed, pixel, sample_idx, 1024 + dim)
    if kind == "sobol":
        s = rng.hash_combine(seed, pixel, jnp.uint32(4096 + dim))
        return sobol_dim(sample_idx, 512 + dim, s)
    if kind == "halton":
        b = min(dim, len(rng.PRIMES) - 1)
        u = rng.radical_inverse(b, sample_idx)
        r = rng.u32_to_float(rng.hash_combine(seed, pixel, 4096 + dim))
        u = u + r
        return jnp.where(u >= 1.0, u - 1.0, u)
    s = rng.hash_combine(seed, pixel, 4096 + dim)
    return rng.van_der_corput(sample_idx, s)


# ---------------------------------------------------------------------------
# Halton global-index machinery (halton.rs:120-156)
# ---------------------------------------------------------------------------


def _inverse_radical(base: int, exp: int, value: int):
    """Index residue whose base-`base` radical inverse lands on `value`
    (reversed digits; halton.rs inverse_radical_inverse)."""
    inv = np.zeros_like(value)
    v = value.copy()
    for _ in range(exp):
        inv = inv * base + (v % base)
        v //= base
    return inv


def halton_tables(width: int, height: int):
    """Per-pixel first-sample indices + strides for the Halton sampler.

    The image plane is tiled 128x128 (halton.rs K_MAX_RESOLUTION); base
    scales 2^j >= min(W,128), 3^k >= min(H,128); the CRT combines the
    per-dimension residues into the global sample index offset."""
    kmax = 128
    j = 0
    while (1 << j) < min(width, kmax):
        j += 1
    k = 0
    while 3 ** k < min(height, kmax):
        k += 1
    sx = 1 << j
    sy = 3 ** k
    stride = sx * sy

    ys, xs = np.mgrid[0:height, 0:width]
    px = (xs % sx).astype(np.int64).ravel()
    py = (ys % sy).astype(np.int64).ravel()

    def mult_inverse(a, n):
        # extended euclid
        g, x = _ext_gcd(a % n, n)
        return x % n

    off = np.zeros(width * height, np.int64)
    # dim 0: base 2
    dim_off = _inverse_radical(2, j, px)
    off += dim_off * (stride // sx) * mult_inverse(stride // sx, sx)
    # dim 1: base 3
    dim_off = _inverse_radical(3, k, py)
    off += dim_off * (stride // sy) * mult_inverse(stride // sy, sy)
    off %= stride

    return {
        "offset": jnp.asarray(off.reshape(height, width).ravel().astype(np.int64)),
        "stride": int(stride),
        "sx": sx,
        "sy": sy,
        "exp_x": j,
        "exp_y": k,
    }


def _ext_gcd(a, b):
    return _ext(a, b)


def _ext(a, b):
    """Returns (g, inverse of a mod b) via iterative extended Euclid."""
    old_r, r = a, b
    old_s, s = 1, 0
    while r:
        q = old_r // r
        old_r, r = r, old_r - q * r
        old_s, s = s, old_s - q * s
    return old_r, old_s


def halton_index(aux, pixel_linear, sample_idx):
    """Global Halton index of sample `sample_idx` at a pixel (linear id)."""
    off = aux["offset"][pixel_linear]
    return off + jnp.asarray(sample_idx, jnp.int64) * aux["stride"]


def halton_film_jitter(aux, pixel_linear, sample_idx):
    """In-pixel (jx, jy) of the Halton point for this pixel/sample: the
    fractional parts of ri_2 * 2^j and ri_3 * 3^k (halton.rs dims 0-1)."""
    idx = halton_index(aux, pixel_linear, sample_idx)
    x = rng.radical_inverse(0, idx) * aux["sx"]
    y = rng.radical_inverse(1, idx) * aux["sy"]
    return x - jnp.floor(x), y - jnp.floor(y)


def halton_dim_2d(aux, pixel_linear, sample_idx, dim: int):
    """2D Halton sample at static dimension pair `dim` >= 1 (bases from the
    prime table with Faure-permutation scrambling, lowdiscrepancy.rs)."""
    idx = halton_index(aux, pixel_linear, sample_idx)
    b0 = min(2 * dim, len(rng.PRIMES) - 2)
    b1 = b0 + 1
    p0 = jnp.asarray(rng.faure_permutation(int(rng.PRIMES[b0])))
    p1 = jnp.asarray(rng.faure_permutation(int(rng.PRIMES[b1])))
    return (
        rng.scrambled_radical_inverse(b0, idx, p0),
        rng.scrambled_radical_inverse(b1, idx, p1),
    )
