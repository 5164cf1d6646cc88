"""Sobol' generator matrices, constructed algorithmically at host time.

The reference ships 27k lines of precomputed tables
(src/core/sobolmatrices.rs, NUM_SOBOL_DIMENSIONS=1024 over 52-bit
matrices). We derive equivalent 32-bit generator matrices from first
principles instead of shipping data:

- primitive polynomials over GF(2) are enumerated by degree and tested for
  primitivity (irreducible + x has order 2^d - 1 in GF(2)[x]/p), exactly
  the classical Sobol construction;
- initial direction numbers m_1..m_s are chosen deterministically from a
  hash (odd, m_i < 2^i) rather than the Joe-Kuo optimized values — each
  dimension is still a base-2 (0,1)-sequence and all Sobol' structural
  guarantees hold; only the *joint* t-values of high-dimension pairs are
  not JK-optimized (documented deviation; the renderer additionally
  Owen-scrambles per pixel, which further decorrelates projections).

Matrices are cached per dimension; `matrix(d)` returns a (32,) uint32
column vector array v_j = m_j << (32 - j).
"""
from __future__ import annotations

import functools

import numpy as np

N_BITS = 32


def _poly_mulmod(a: int, b: int, p: int, d: int) -> int:
    """(a*b) mod p over GF(2), p of degree d."""
    r = 0
    while b:
        if b & 1:
            r ^= a
        b >>= 1
        a <<= 1
        if a >> d & 1:
            a ^= p
    return r


def _poly_powmod(a: int, e: int, p: int, d: int) -> int:
    r = 1
    while e:
        if e & 1:
            r = _poly_mulmod(r, a, p, d)
        a = _poly_mulmod(a, a, p, d)
        e >>= 1
    return r


def _prime_factors(n: int) -> list[int]:
    out = []
    f = 2
    while f * f <= n:
        if n % f == 0:
            out.append(f)
            while n % f == 0:
                n //= f
        f += 1
    if n > 1:
        out.append(n)
    return out


@functools.lru_cache(maxsize=None)
def _mersenne_factors(d: int) -> tuple:
    return tuple(_prime_factors((1 << d) - 1))


def _is_primitive(p: int, d: int) -> bool:
    """p (bitmask incl. x^d term) primitive over GF(2)?"""
    order = (1 << d) - 1
    # x^order == 1 mod p (implies p | x^order - 1; combined with the
    # subgroup checks below this gives primitivity for squarefree p)
    if _poly_powmod(2, order, p, d) != 1:
        return False
    for q in _mersenne_factors(d):
        if _poly_powmod(2, order // q, p, d) == 1:
            return False
    return True


@functools.lru_cache(maxsize=None)
def _primitive_polys(count: int) -> tuple:
    """First `count` primitive polynomials as (degree, a-coeff bits) where
    the a bits are the coefficients of x^{d-1}..x^1 (constant term is 1)."""
    out = []
    d = 1
    while len(out) < count:
        for a in range(1 << (d - 1)):
            p = (1 << d) | (a << 1) | 1
            if _is_primitive(p, d):
                out.append((d, a))
                if len(out) == count:
                    break
        d += 1
    return tuple(out)


def _hash64(x: int) -> int:
    x = (x ^ (x >> 30)) * 0xBF58476D1CE4E5B9 & 0xFFFFFFFFFFFFFFFF
    x = (x ^ (x >> 27)) * 0x94D049BB133111EB & 0xFFFFFFFFFFFFFFFF
    return x ^ (x >> 31)


@functools.lru_cache(maxsize=None)
def matrix(dim: int) -> np.ndarray:
    """32-bit generator matrix columns for Sobol dimension `dim` (0-based)."""
    if dim == 0:
        # van der Corput: identity matrix
        return (np.uint32(1) << (N_BITS - 1 - np.arange(N_BITS, dtype=np.uint32))).astype(np.uint32)
    d, a = _primitive_polys(dim)[dim - 1]
    # deterministic odd initial direction numbers m_i < 2^i
    m = [0] * (N_BITS + 1)
    for i in range(1, d + 1):
        m[i] = (_hash64(dim * 1315423911 + i) % (1 << i)) | 1
    for k in range(d + 1, N_BITS + 1):
        v = m[k - d] ^ (m[k - d] << d)
        for j in range(1, d):
            if (a >> (d - 1 - j)) & 1:
                v ^= m[k - j] << j
        m[k] = v
    cols = np.zeros(N_BITS, np.uint32)
    for j in range(1, N_BITS + 1):
        cols[j - 1] = np.uint32((m[j] << (N_BITS - j)) & 0xFFFFFFFF)
    return cols


def matrices(n_dims: int) -> np.ndarray:
    """(n_dims, 32) uint32 stack of generator matrices."""
    _primitive_polys(max(n_dims - 1, 1))  # batch the enumeration
    return np.stack([matrix(i) for i in range(n_dims)])
