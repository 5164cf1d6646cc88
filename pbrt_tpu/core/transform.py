"""Host-side 4x4 transforms (NumPy, float64 internally, float32 export).

Covers the capability surface of the reference's transform layer
(/root/reference/src/core/transform.rs): matrix+inverse pairs, the standard
factory constructors (translate/scale/rotate/look_at/orthographic/perspective),
and application to points/vectors/normals/bounds/rays.  Unlike the reference,
transforms only exist at scene-compile time on the host — the device side
receives pre-transformed world-space geometry plus per-quadric 3x4 matrices —
so there is no error-propagating transform path here; robust offsets are
handled in the device kernels with gamma bounds.
"""
from __future__ import annotations

import math
from dataclasses import dataclass, field

import numpy as np


def _mat_identity() -> np.ndarray:
    return np.eye(4, dtype=np.float64)


@dataclass(frozen=True)
class Transform:
    """A 4x4 matrix together with its inverse (reference: transform.rs:189)."""

    m: np.ndarray = field(default_factory=_mat_identity)
    m_inv: np.ndarray = field(default_factory=_mat_identity)

    def __post_init__(self):
        object.__setattr__(self, "m", np.asarray(self.m, dtype=np.float64).reshape(4, 4))
        object.__setattr__(self, "m_inv", np.asarray(self.m_inv, dtype=np.float64).reshape(4, 4))

    # -- constructors -------------------------------------------------------
    @staticmethod
    def from_matrix(m) -> "Transform":
        m = np.asarray(m, dtype=np.float64).reshape(4, 4)
        return Transform(m, np.linalg.inv(m))

    @staticmethod
    def identity() -> "Transform":
        return Transform()

    @staticmethod
    def translate(delta) -> "Transform":
        d = np.asarray(delta, dtype=np.float64)
        m = np.eye(4)
        m[:3, 3] = d
        mi = np.eye(4)
        mi[:3, 3] = -d
        return Transform(m, mi)

    @staticmethod
    def scale(x, y, z) -> "Transform":
        m = np.diag([x, y, z, 1.0]).astype(np.float64)
        mi = np.diag([1.0 / x, 1.0 / y, 1.0 / z, 1.0]).astype(np.float64)
        return Transform(m, mi)

    @staticmethod
    def rotate_x(deg) -> "Transform":
        s, c = math.sin(math.radians(deg)), math.cos(math.radians(deg))
        m = np.eye(4)
        m[1, 1], m[1, 2], m[2, 1], m[2, 2] = c, -s, s, c
        return Transform(m, m.T)

    @staticmethod
    def rotate_y(deg) -> "Transform":
        s, c = math.sin(math.radians(deg)), math.cos(math.radians(deg))
        m = np.eye(4)
        m[0, 0], m[0, 2], m[2, 0], m[2, 2] = c, s, -s, c
        return Transform(m, m.T)

    @staticmethod
    def rotate_z(deg) -> "Transform":
        s, c = math.sin(math.radians(deg)), math.cos(math.radians(deg))
        m = np.eye(4)
        m[0, 0], m[0, 1], m[1, 0], m[1, 1] = c, -s, s, c
        return Transform(m, m.T)

    @staticmethod
    def rotate(deg, axis) -> "Transform":
        """Rotation of `deg` degrees about an arbitrary axis (transform.rs:311)."""
        a = np.asarray(axis, dtype=np.float64)
        a = a / np.linalg.norm(a)
        s, c = math.sin(math.radians(deg)), math.cos(math.radians(deg))
        m = np.eye(4)
        x, y, z = a
        m[0, 0] = x * x + (1 - x * x) * c
        m[0, 1] = x * y * (1 - c) - z * s
        m[0, 2] = x * z * (1 - c) + y * s
        m[1, 0] = x * y * (1 - c) + z * s
        m[1, 1] = y * y + (1 - y * y) * c
        m[1, 2] = y * z * (1 - c) - x * s
        m[2, 0] = x * z * (1 - c) - y * s
        m[2, 1] = y * z * (1 - c) + x * s
        m[2, 2] = z * z + (1 - z * z) * c
        return Transform(m, m.T)

    @staticmethod
    def look_at(eye, look, up) -> "Transform":
        """Camera-to-world transform (reference: transform.rs:355-383)."""
        eye = np.asarray(eye, dtype=np.float64)
        look = np.asarray(look, dtype=np.float64)
        up = np.asarray(up, dtype=np.float64)
        d = look - eye
        d = d / np.linalg.norm(d)
        upn = up / np.linalg.norm(up)
        right = np.cross(upn, d)
        rn = np.linalg.norm(right)
        if rn < 1e-12:
            # up parallel to viewing direction: pick an arbitrary right vector.
            right = np.cross(np.array([0.0, 0.0, 1.0]) if abs(d[2]) < 0.9 else np.array([1.0, 0.0, 0.0]), d)
            rn = np.linalg.norm(right)
        right = right / rn
        new_up = np.cross(d, right)
        c2w = np.eye(4)
        c2w[:3, 0] = right
        c2w[:3, 1] = new_up
        c2w[:3, 2] = d
        c2w[:3, 3] = eye
        return Transform(c2w, np.linalg.inv(c2w))

    @staticmethod
    def orthographic(znear, zfar) -> "Transform":
        return Transform.scale(1.0, 1.0, 1.0 / (zfar - znear)) @ Transform.translate([0.0, 0.0, -znear])

    @staticmethod
    def perspective(fov_deg, n, f) -> "Transform":
        """Perspective projection (transform.rs:397-411)."""
        persp = np.array(
            [
                [1.0, 0.0, 0.0, 0.0],
                [0.0, 1.0, 0.0, 0.0],
                [0.0, 0.0, f / (f - n), -f * n / (f - n)],
                [0.0, 0.0, 1.0, 0.0],
            ]
        )
        inv_tan = 1.0 / math.tan(math.radians(fov_deg) / 2.0)
        return Transform.scale(inv_tan, inv_tan, 1.0) @ Transform.from_matrix(persp)

    # -- algebra ------------------------------------------------------------
    def inverse(self) -> "Transform":
        return Transform(self.m_inv, self.m)

    def __matmul__(self, other: "Transform") -> "Transform":
        return Transform(self.m @ other.m, other.m_inv @ self.m_inv)

    def is_identity(self) -> bool:
        return np.allclose(self.m, np.eye(4), atol=1e-12)

    def swaps_handedness(self) -> bool:
        """Sign of the upper-3x3 determinant (transform.rs:638)."""
        return float(np.linalg.det(self.m[:3, :3])) < 0.0

    def has_scale(self) -> bool:
        for v in np.eye(3):
            la2 = float(np.sum(self.xvector(v) ** 2))
            if la2 < 0.999 or la2 > 1.001:
                return True
        return False

    # -- application (vectorized over leading axes) -------------------------
    def xpoint(self, p) -> np.ndarray:
        p = np.asarray(p, dtype=np.float64)
        r = p @ self.m[:3, :3].T + self.m[:3, 3]
        w = p @ self.m[3, :3].T + self.m[3, 3]
        if np.any(np.abs(w - 1.0) > 1e-9):
            r = r / w[..., None] if r.ndim > 1 else r / w
        return r

    def xvector(self, v) -> np.ndarray:
        v = np.asarray(v, dtype=np.float64)
        return v @ self.m[:3, :3].T

    def xnormal(self, n) -> np.ndarray:
        n = np.asarray(n, dtype=np.float64)
        return n @ self.m_inv[:3, :3]

    def xbounds(self, lo, hi) -> tuple[np.ndarray, np.ndarray]:
        lo = np.asarray(lo, dtype=np.float64)
        hi = np.asarray(hi, dtype=np.float64)
        corners = np.array([[lo[i] if (k >> i) & 1 == 0 else hi[i] for i in range(3)] for k in range(8)])
        wc = self.xpoint(corners)
        return wc.min(axis=0), wc.max(axis=0)

    def key(self) -> bytes:
        """Hashable dedup key over matrix bytes (reference TransformCache, api.rs:406)."""
        return np.ascontiguousarray(self.m, dtype=np.float64).tobytes()


def solve_linear_2x2(a00, a01, a10, a11, b0, b1):
    det = a00 * a11 - a01 * a10
    if abs(det) < 1e-10:
        return None
    return ((a11 * b0 - a01 * b1) / det, (a00 * b1 - a10 * b0) / det)
