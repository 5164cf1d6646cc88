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

# Geometry correctness requires true f32 matmuls: TPU MXU default precision
# rounds einsum/dot inputs to bfloat16 (~0.4% relative error), which put
# sphere hit points up to 1.5% off the surface (ring-shaped self-intersection
# acne through the 1e-3 ray-offset epsilon) and truncated every one-hot-matmul
# table gather (device/gather.py). Pallas kernels are unaffected (they set
# their own precision); anything that deliberately wants bf16 must opt down
# per-op with precision=jax.lax.Precision.DEFAULT.
import jax as _jax

_jax.config.update("jax_default_matmul_precision", "float32")

# Platform escape hatch: environments that preload jax with a pinned
# JAX_PLATFORMS (e.g. a sitecustomize tunnel shim) make the env var
# ineffective by the time user code runs; jax.config.update still works
# until the first backend init, so honor PBRT_TPU_PLATFORM here.
import os as _os

_plat = _os.environ.get("PBRT_TPU_PLATFORM")
if _plat:
    _jax.config.update("jax_platforms", _plat)

# Persistent compilation cache: the unrolled bounce pipelines compile in
# minutes on TPU; caching them across processes makes reruns start in
# seconds. Harmless on CPU test runs.
import os as _os

_cache_dir = _os.environ.get("PBRT_TPU_COMPILE_CACHE",
                             _os.path.expanduser("~/.cache/pbrt_tpu_xla"))
try:
    _os.makedirs(_cache_dir, exist_ok=True)
    _jax.config.update("jax_compilation_cache_dir", _cache_dir)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
except Exception:  # pragma: no cover - cache is best-effort
    pass

__all__ = ["render", "parser", "scene", "device", "core", "utils", "parallel"]
