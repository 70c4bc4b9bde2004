"""alg_tpu — TPU-native adaptive low-pass guidance (ALG) for image-to-video diffusion.

A from-scratch JAX/XLA/Pallas framework with the capabilities of choi403/ALG
(arXiv 2506.08456): CogVideoX-5b-I2V, Wan2.1-I2V-14B, and HunyuanVideo-I2V
image-to-video sampling with adaptive low-pass filtering of the conditioning
image during early denoising steps.

Design highlights (TPU-first, not a port):
  * The per-step low-pass filter (bilinear down/up resize or Gaussian blur,
    reference ``lp_utils.py:8-60``) is precomputed at trace time as a pair of
    separable linear operators ``[T, H, H]`` / ``[T, W, W]`` — one matrix pair
    per denoise step, identity on inactive steps — so the whole adaptive
    schedule becomes two batched MXU matmuls inside a single jit-compiled
    ``lax.scan`` denoise loop: zero host round-trips, zero recompiles.
  * 2-pass vs 3-pass CFG switching (reference ``...cogvideox...py:1029-1070``)
    is resolved at trace time into contiguous step segments, each a fixed-shape
    scan.
  * DiT attention runs as a Pallas flash-attention kernel; models shard over an
    ICI mesh via ``jax.sharding`` for batched multi-prompt serving.
"""

__version__ = "0.1.0"


_TOP_LEVEL = {
    # serving surface
    "BatchRequest": ("alg_tpu.serving", "BatchRequest"),
    "serve_batch": ("alg_tpu.serving", "serve_batch"),
    "shard_pipeline": ("alg_tpu.serving", "shard_pipeline"),
    # loading
    "load_pipeline": ("alg_tpu.cli", "load_pipeline"),
    "load_run_config": ("alg_tpu.core.config", "load_run_config"),
    # pipelines
    "CogVideoXPipeline": ("alg_tpu.pipelines", "CogVideoXPipeline"),
    "WanPipeline": ("alg_tpu.pipelines", "WanPipeline"),
    "HunyuanVideoPipeline": ("alg_tpu.pipelines", "HunyuanVideoPipeline"),
    # mesh
    "make_mesh": ("alg_tpu.sharding", "make_mesh"),
}


def __getattr__(name):
    """Lazy top-level re-exports — keep `import alg_tpu` light (no jax-heavy
    submodule import until a symbol is actually used)."""
    try:
        module, attr = _TOP_LEVEL[name]
    except KeyError:
        raise AttributeError(f"module 'alg_tpu' has no attribute {name!r}") from None
    import importlib

    return getattr(importlib.import_module(module), attr)


def __dir__():
    return sorted(list(globals()) + list(_TOP_LEVEL))
