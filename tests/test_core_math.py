"""Transform / spectrum / imageio host-math tests (reference tests/ analogues)."""
import numpy as np
import pytest

from pbrt_tpu.core.transform import Transform
from pbrt_tpu.core import spectrum, imageio


class TestTransform:
    def test_translate_roundtrip(self):
        t = Transform.translate([1, 2, 3])
        p = np.array([4.0, 5.0, 6.0])
        assert np.allclose(t.xpoint(p), [5, 7, 9])
        assert np.allclose(t.inverse().xpoint(t.xpoint(p)), p)

    def test_vectors_ignore_translation(self):
        t = Transform.translate([1, 2, 3])
        assert np.allclose(t.xvector([1, 0, 0]), [1, 0, 0])

    def test_rotate_90_z(self):
        t = Transform.rotate(90, [0, 0, 1])
        assert np.allclose(t.xpoint([1, 0, 0]), [0, 1, 0], atol=1e-12)

    def test_rotate_axis_matches_euler(self):
        for deg in (17.0, 133.0):
            assert np.allclose(Transform.rotate(deg, [1, 0, 0]).m, Transform.rotate_x(deg).m, atol=1e-12)
            assert np.allclose(Transform.rotate(deg, [0, 1, 0]).m, Transform.rotate_y(deg).m, atol=1e-12)

    def test_normal_transform_preserves_orthogonality(self):
        t = Transform.scale(1, 1, 4)
        # surface z = const scaled: tangent (1,0,0) unchanged, normal stays (0,0,±1) dir
        n = t.xnormal([0, 0, 1])
        v = t.xvector([1, 0, 0])
        assert abs(np.dot(n, v)) < 1e-12
        # a 45-degree normal must tilt under anisotropic scale
        n2 = t.xnormal([0, 1, 1])
        v2 = t.xvector([0, 1, -1])
        assert abs(np.dot(n2, v2)) < 1e-12

    def test_look_at_origin(self):
        c2w = Transform.look_at([2, 2, 5], [0, -0.4, 0], [0, 1, 0])
        assert np.allclose(c2w.xpoint([0, 0, 0]), [2, 2, 5])
        fwd = c2w.xvector([0, 0, 1])
        expect = np.array([0, -0.4, 0]) - np.array([2, 2, 5])
        expect = expect / np.linalg.norm(expect)
        assert np.allclose(fwd, expect, atol=1e-12)

    def test_compose_matches_sequential(self):
        a = Transform.rotate(30, [0, 1, 0])
        b = Transform.translate([1, 0, 0])
        p = np.array([0.3, 0.7, -0.2])
        assert np.allclose((a @ b).xpoint(p), a.xpoint(b.xpoint(p)))

    def test_swaps_handedness(self):
        assert Transform.scale(-1, 1, 1).swaps_handedness()
        assert not Transform.scale(2, 2, 2).swaps_handedness()

    def test_bounds_transform_contains_corners(self):
        t = Transform.rotate(33, [1, 1, 0])
        lo, hi = t.xbounds([-1, -2, -3], [1, 2, 3])
        rng = np.random.RandomState(0)
        pts = rng.uniform([-1, -2, -3], [1, 2, 3], size=(100, 3))
        w = t.xpoint(pts)
        assert (w >= lo - 1e-9).all() and (w <= hi + 1e-9).all()


class TestSpectrum:
    def test_white_spd_is_neutral(self):
        lam = np.linspace(380, 720, 60)
        rgb = spectrum.spd_to_rgb(lam, np.ones_like(lam))
        # flat SPD = equal-energy illuminant E: slightly red of D65 white in
        # sRGB (x=y=1/3), so expect near-white with a mild warm shift
        assert np.all(rgb > 0.8) and np.all(rgb < 1.3)
        assert abs(rgb.max() - rgb.min()) < 0.35

    def test_blackbody_rgb_temperature_trend(self):
        cold = spectrum.blackbody_rgb(2500)
        hot = spectrum.blackbody_rgb(9000)
        assert cold[0] / max(cold[2], 1e-9) > 2.0  # red-dominant
        assert hot[2] > hot[0] * 0.8  # blue-rich

    def test_blackbody_planck_value(self):
        # Planck's law at 6000K, 500nm: ~3.18e13 W/(m^2 sr m)
        le = spectrum.blackbody(np.array([500.0]), 6000.0)[0]
        assert le == pytest.approx(3.179e13, rel=1e-2)

    def test_xyz_rgb_roundtrip(self):
        rgb = np.array([0.2, 0.5, 0.8])
        assert np.allclose(spectrum.xyz_to_rgb(spectrum.rgb_to_xyz(rgb)), rgb, atol=1e-4)

    def test_y_is_luminance(self):
        assert spectrum.y_of_rgb([1.0, 1.0, 1.0]) == pytest.approx(1.0, abs=1e-3)


class TestImageIO:
    def test_exr_roundtrip_float(self, tmp_path):
        img = np.random.RandomState(1).rand(33, 65, 3).astype(np.float32) * 10
        p = str(tmp_path / "t.exr")
        imageio.write_exr(p, img, half=False)
        assert np.abs(imageio.read_exr(p) - img).max() == 0

    def test_exr_roundtrip_half(self, tmp_path):
        img = np.random.RandomState(2).rand(16, 16, 3).astype(np.float32)
        p = str(tmp_path / "t.exr")
        imageio.write_exr(p, img, half=True)
        assert np.abs(imageio.read_exr(p) - img).max() < 1e-3

    def test_png_roundtrip_srgb(self, tmp_path):
        img = np.random.RandomState(3).rand(8, 8, 3).astype(np.float32)
        p = str(tmp_path / "t.png")
        imageio.write_image(p, img)
        back = imageio.read_image(p)
        assert np.abs(back - img).max() < 0.01  # 8-bit quantization

    def test_srgb_curves_inverse(self):
        x = np.linspace(0, 1, 100)
        assert np.allclose(imageio.srgb_to_linear(imageio.linear_to_srgb(x)), x, atol=1e-6)

    def test_pfm_roundtrip(self, tmp_path):
        img = np.random.RandomState(4).rand(9, 7, 3).astype(np.float32)
        p = str(tmp_path / "t.pfm")
        imageio.write_image(p, img)
        assert np.abs(imageio.read_image(p) - img).max() == 0

    def test_reference_envmap_formats_agree(self):
        import os

        exr = "/root/reference/src/scenes/textures/envmap.exr"
        hdr = "/root/reference/src/scenes/textures/envmap.hdr"
        if not (os.path.exists(exr) and os.path.exists(hdr)):
            pytest.skip("reference assets missing")
        a = imageio.read_image(exr)
        b = imageio.read_image(hdr)
        assert a.shape == b.shape
        # same content up to RGBE quantization
        assert np.median(np.abs(a - b)) < 0.01
