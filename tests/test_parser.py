"""Parser / lexer / ParamSet / API state machine tests.

Modeled on the reference's parser coverage plus the scene files bundled with
it (reference tests are math-kernel only; parsing is exercised end-to-end
through its scenes, see SURVEY.md §4)."""
import os
import textwrap

import numpy as np
import pytest

from pbrt_tpu.parser.lexer import tokenize, NUM, STR, IDENT, LBRACK
from pbrt_tpu.parser.parser import parse_tokens, parse_file
from pbrt_tpu.parser.api import API, pbrt_parse
from pbrt_tpu.core.paramset import ParamSet

REF_SCENES = "/root/reference/src/scenes"


def test_lexer_basic():
    toks = list(tokenize('Shape "sphere" "float radius" [2.5] # comment\nTranslate -1 .5 1e2'))
    kinds = [t.kind for t in toks]
    assert kinds == [IDENT, STR, STR, LBRACK, NUM, "RBRACK", IDENT, NUM, NUM, NUM]
    assert toks[4].value == 2.5
    assert toks[-1].value == 100.0
    assert toks[-3].value == -1.0


def test_lexer_negative_and_exponent():
    toks = list(tokenize("1 -2 +3.5 .25 -.5 2e-3 1.5E+2"))
    vals = [t.value for t in toks]
    assert vals == [1.0, -2.0, 3.5, 0.25, -0.5, 0.002, 150.0]


def test_paramset_types(tmp_path):
    ps = ParamSet()
    ps.add("float", "fov", [30.0])
    ps.add("integer", "xresolution", [640.0])
    ps.add("rgb", "L", [1.0, 2.0, 3.0])
    ps.add("point", "from", [0.0, 1.0, 2.0])
    ps.add("bool", "twosided", [True])
    ps.add("string", "filename", ["out.exr"])
    assert ps.find_one_float("fov", 90.0) == 30.0
    assert ps.find_one_int("xresolution", 1) == 640
    assert np.allclose(ps.find_one_rgb("L", [0, 0, 0]), [1, 2, 3])
    assert np.allclose(ps.find_one_point3("from", [9, 9, 9]), [0, 1, 2])
    assert ps.find_one_bool("twosided", False) is True
    assert ps.find_one_string("filename", "") == "out.exr"
    # defaults pass through
    assert ps.find_one_float("missing", 7.5) == 7.5


def test_paramset_blackbody_is_warm():
    ps = ParamSet()
    ps.add("blackbody", "I", [3000.0, 1.0])
    rgb = ps.find_one_rgb("I", [0, 0, 0])
    assert rgb[0] > rgb[1] > rgb[2] > 0  # 3000K is red-heavy


def test_parse_scene_string(tmp_path):
    scene = textwrap.dedent(
        """
        LookAt 0 0 5  0 0 0  0 1 0
        Camera "perspective" "float fov" [45]
        Film "image" "integer xresolution" [64] "integer yresolution" [48]
        Sampler "random" "integer pixelsamples" [4]
        Integrator "path" "integer maxdepth" [3]
        WorldBegin
        LightSource "point" "color I" [10 10 10] "point from" [0 3 0]
        AttributeBegin
          Translate 0 0 0
          Material "matte" "rgb Kd" [.7 .2 .2]
          Shape "sphere" "float radius" [1]
        AttributeEnd
        WorldEnd
        """
    )
    f = tmp_path / "scene.pbrt"
    f.write_text(scene)
    desc = pbrt_parse(str(f))
    assert desc.film.x_resolution == 64
    assert desc.camera.fov == 45
    assert desc.sampler.pixel_samples == 4
    assert desc.integrator.kind == "path"
    assert desc.integrator.max_depth == 3
    assert len(desc.primitives) == 1
    assert desc.primitives[0].shape.sphere is not None
    assert len(desc.lights) == 1


def test_attribute_stack_restores_material(tmp_path):
    scene = textwrap.dedent(
        """
        WorldBegin
        Material "mirror"
        AttributeBegin
          Material "glass"
          Shape "sphere"
        AttributeEnd
        Shape "sphere"
        WorldEnd
        """
    )
    f = tmp_path / "s.pbrt"
    f.write_text(scene)
    desc = pbrt_parse(str(f))
    assert desc.primitives[0].material.kind == "glass"
    assert desc.primitives[1].material.kind == "mirror"


def test_transform_directives_compose(tmp_path):
    scene = textwrap.dedent(
        """
        WorldBegin
        Translate 1 0 0
        Scale 2 2 2
        Shape "sphere" "float radius" [1]
        WorldEnd
        """
    )
    f = tmp_path / "s.pbrt"
    f.write_text(scene)
    desc = pbrt_parse(str(f))
    sph = desc.primitives[0].shape.sphere
    # center maps to (1,0,0); radius scales by 2 in bounds
    c = sph.object_to_world.xpoint([0, 0, 0])
    assert np.allclose(c, [1, 0, 0])
    p = sph.object_to_world.xpoint([1, 0, 0])
    assert np.allclose(p, [3, 0, 0])


def test_object_instancing_expands(tmp_path):
    scene = textwrap.dedent(
        """
        WorldBegin
        ObjectBegin "thing"
          Shape "sphere" "float radius" [1]
        ObjectEnd
        ObjectInstance "thing"
        Translate 5 0 0
        ObjectInstance "thing"
        WorldEnd
        """
    )
    f = tmp_path / "s.pbrt"
    f.write_text(scene)
    desc = pbrt_parse(str(f))
    assert len(desc.primitives) == 2
    c0 = desc.primitives[0].shape.sphere.object_to_world.xpoint([0, 0, 0])
    c1 = desc.primitives[1].shape.sphere.object_to_world.xpoint([0, 0, 0])
    assert np.allclose(c0, [0, 0, 0])
    assert np.allclose(c1, [5, 0, 0])


def test_include(tmp_path):
    (tmp_path / "inner.pbrt").write_text('Shape "sphere"\n')
    (tmp_path / "main.pbrt").write_text('WorldBegin\nInclude "inner.pbrt"\nWorldEnd\n')
    desc = pbrt_parse(str(tmp_path / "main.pbrt"))
    assert len(desc.primitives) == 1


@pytest.mark.skipif(not os.path.isdir(REF_SCENES), reason="reference scenes not mounted")
def test_reference_spheres_scene():
    desc = pbrt_parse(os.path.join(REF_SCENES, "spheres-differentials-texfilt.pbrt"))
    assert desc.film.x_resolution == 1000
    assert desc.film.y_resolution == 500
    assert desc.integrator.kind == "directlighting"
    assert desc.integrator.max_depth == 10
    assert desc.sampler.kind == "zerotwosequence"
    kinds = sorted(p.material.kind for p in desc.primitives)
    assert kinds == ["glass", "matte", "mirror"]
    assert desc.lights[0].kind == "distant"
    assert np.allclose(desc.lights[0].intensity, [3.141593] * 3)


@pytest.mark.skipif(not os.path.isdir(REF_SCENES), reason="reference scenes not mounted")
def test_reference_caustic_scene():
    desc = pbrt_parse(os.path.join(REF_SCENES, "caustic-glass.pbrt"))
    assert desc.integrator.kind == "sppm"
    assert desc.integrator.num_iterations == 10000
    meshes = [p for p in desc.primitives if p.shape.mesh is not None]
    assert len(meshes) == 2
    assert len(meshes[0].shape.mesh.indices) == 88064  # ply face count
    spot = [l for l in desc.lights if l.kind == "spot"][0]
    assert spot.cone_angle == 30.0  # default
