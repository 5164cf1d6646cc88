"""pbrt_tpu: a TPU-native physically based renderer.

A ground-up JAX/XLA re-design of the pbrt-v3 feature set (reference:
alexmeli100/pbrt-rust): the .pbrt scene language, integrators, BSDFs,
lights, shapes, samplers and filters — with the device path expressed as
batched wavefront array programs over flat SoA scene tables.

Public entry points:
    pbrt_tpu.parser.api.pbrt_parse(path)  ->  SceneDescription
    pbrt_tpu.render.render(desc)          ->  (H, W, 3) float32 image
    python -m pbrt_tpu.main scene.pbrt    ->  CLI (reference main.rs flags)
"""

__version__ = "0.1.0"

__all__ = ["render", "parser", "scene", "device", "core", "utils", "parallel"]
