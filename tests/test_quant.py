"""Opt-in W8A8 int8 serving mode (alg_tpu.ops.quant) — mechanics and e2e."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from alg_tpu.models import layers as L
from alg_tpu.ops.quant import (
    quantize_kernel,
    quantize_pipeline,
    quantize_transformer_params,
    quantized_linear,
)


def test_quantized_linear_matches_numpy_reference(rng):
    x = rng.randn(3, 17, 256).astype(np.float32)
    w = rng.randn(256, 384).astype(np.float32) * 0.05
    b = rng.randn(384).astype(np.float32)
    kq, scale = quantize_kernel(jnp.asarray(w))
    p = {"kernel_q": kq, "w_scale": scale, "bias": jnp.asarray(b)}
    out = np.asarray(quantized_linear(p, jnp.asarray(x)))

    # numpy mirror of the scale math
    xs = np.maximum(np.abs(x).max(-1, keepdims=True) / 127.0, 1e-12)
    xq = np.clip(np.round(x / xs), -127, 127).astype(np.int8)
    acc = xq.astype(np.int32) @ np.asarray(kq, np.int32)
    ref = acc.astype(np.float32) * xs * np.asarray(scale).reshape(-1) + b
    np.testing.assert_allclose(out, ref, atol=1e-3)

    # and close to the full-precision result (int8 granularity)
    fp = x @ w + b
    rel = np.abs(out - fp).max() / np.abs(fp).max()
    assert rel < 0.02, rel


def test_quantize_skips_modulation_and_small_layers():
    from alg_tpu.models.cogvideox import CogVideoXTransformerConfig, init_cogvideox_transformer

    cfg = CogVideoXTransformerConfig(
        num_attention_heads=4, attention_head_dim=32, in_channels=8, out_channels=4,
        time_embed_dim=128, text_embed_dim=128, num_layers=2,
        sample_height=8, sample_width=8, max_text_seq_length=5,
    )
    params = init_cogvideox_transformer(jax.random.PRNGKey(0), cfg)
    qp = quantize_transformer_params(params)

    # attention + ff quantized (stacked [L, in, out] → int8 + [L, 1, out] scales)
    assert "kernel_q" in qp["blocks"]["attn"]["to_q"]
    assert qp["blocks"]["attn"]["to_q"]["kernel_q"].dtype == jnp.int8
    assert qp["blocks"]["ff"]["fc_in"]["w_scale"].shape[0] == cfg.num_layers
    # modulation projections stay full precision
    assert "kernel" in qp["blocks"]["norm1"]["linear"]
    # non-block trees untouched
    assert "kernel" in qp["patch_embed"]["proj"]


def test_quantized_pipeline_end_to_end_close_to_fp(rng):
    from alg_tpu.models.cogvideox import (
        CogVideoXTransformerConfig,
        CogVideoXVAEConfig,
        init_cogvideox_transformer,
        init_cogvideox_vae,
    )
    from alg_tpu.pipelines import CogVideoXPipeline

    tcfg = CogVideoXTransformerConfig(
        num_attention_heads=4, attention_head_dim=32, in_channels=8, out_channels=4,
        time_embed_dim=128, text_embed_dim=128, num_layers=2,
        sample_height=8, sample_width=8, max_text_seq_length=5,
    )
    vcfg = CogVideoXVAEConfig(
        block_out_channels=(8, 16, 16, 32), latent_channels=4, layers_per_block=1,
        norm_num_groups=4,
    )
    pipe = CogVideoXPipeline(
        transformer_cfg=tcfg,
        transformer_params=init_cogvideox_transformer(jax.random.PRNGKey(0), tcfg),
        vae_cfg=vcfg,
        vae_params=init_cogvideox_vae(jax.random.PRNGKey(1), vcfg),
    )
    kwargs = dict(
        image=np.random.RandomState(7).rand(1, 3, 32, 32).astype(np.float32) * 2 - 1,
        prompt_embeds=jnp.asarray(rng.randn(1, 5, 128).astype(np.float32)),
        negative_prompt_embeds=jnp.asarray(rng.randn(1, 5, 128).astype(np.float32)),
        height=32, width=32, num_frames=5, num_inference_steps=2,
        guidance_scale=6.0, seed=42, output_type="latent",
    )
    fp = pipe(**kwargs)
    qpipe = quantize_pipeline(pipe)
    q = qpipe(**kwargs)
    assert q.shape == fp.shape
    assert np.isfinite(q).all()
    # int8 changes numerics; the trajectories must stay strongly correlated.
    # Drift stats (VERDICT r2 #3): recorded in the assertion message so a
    # failing run reports the magnitude, and typical values are documented in
    # docs/PERF.md (W8A8 section).
    fp_np, q_np = np.asarray(fp), np.asarray(q)
    corr = np.corrcoef(q_np.ravel(), fp_np.ravel())[0, 1]
    mean_abs = float(np.abs(q_np - fp_np).mean())
    max_abs = float(np.abs(q_np - fp_np).max())
    rms = float(np.sqrt(np.mean(fp_np**2)))
    assert corr > 0.95, f"corr {corr:.4f}, mean|Δ| {mean_abs:.4f}, max|Δ| {max_abs:.4f}, fp RMS {rms:.4f}"
    assert mean_abs < 0.25 * rms, f"mean|Δ| {mean_abs:.4f} vs fp RMS {rms:.4f}"


def test_quantized_pipeline_shards_and_matches_unsharded(rng):
    """W8A8 + TP×DP serving compose: the quantization-aware partition specs
    shard kernel_q/w_scale and the sharded result equals the unsharded one."""
    import jax as _jax

    from alg_tpu.models.cogvideox import (
        CogVideoXTransformerConfig,
        CogVideoXVAEConfig,
        init_cogvideox_transformer,
        init_cogvideox_vae,
    )
    from alg_tpu.ops.attention import set_attention_impl
    from alg_tpu.pipelines import CogVideoXPipeline
    from alg_tpu.serving import BatchRequest, serve_batch, shard_pipeline
    from alg_tpu.sharding import make_mesh

    cpus = _jax.local_devices(backend="cpu")
    if len(cpus) < 8:
        pytest.skip("need 8 cpu devices")
    with _jax.default_device(cpus[0]):
        tcfg = CogVideoXTransformerConfig(
            num_attention_heads=4, attention_head_dim=32, in_channels=8, out_channels=4,
            time_embed_dim=128, text_embed_dim=128, num_layers=2,
            sample_height=4, sample_width=4, max_text_seq_length=5,
        )
        vcfg = CogVideoXVAEConfig(
            block_out_channels=(8, 16, 16, 32), latent_channels=4, layers_per_block=1,
            norm_num_groups=4,
        )
        pipe = CogVideoXPipeline(
            transformer_cfg=tcfg,
            transformer_params=init_cogvideox_transformer(_jax.random.PRNGKey(0), tcfg),
            vae_cfg=vcfg,
            vae_params=init_cogvideox_vae(_jax.random.PRNGKey(1), vcfg),
        )
        pipe = quantize_pipeline(pipe)
        pipe.encode_prompt = lambda prompts, max_len=226: jnp.asarray(
            np.random.RandomState(3).randn(len(prompts), 5, 128).astype(np.float32)
        )
        r = np.random.RandomState(7)
        reqs = [
            BatchRequest(prompt="a", image=r.rand(1, 3, 32, 32).astype(np.float32) * 2 - 1, seed=42),
            BatchRequest(prompt="b", image=r.rand(1, 3, 32, 32).astype(np.float32) * 2 - 1, seed=7),
        ]
        kwargs = dict(height=32, width=32, num_frames=5, num_inference_steps=2,
                      guidance_scale=6.0, output_type="latent")

        set_attention_impl("xla")
        try:
            ref = serve_batch(pipe, reqs, **kwargs)
            mesh = make_mesh(dp=2, tp=4, devices=cpus[:8])
            pipe_sh = shard_pipeline(pipe, mesh)
            pipe_sh.encode_prompt = pipe.encode_prompt
            with mesh:
                out = serve_batch(pipe_sh, reqs, **kwargs)
        finally:
            set_attention_impl(None)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)


def test_quantize_modulation_opt_in(rng):
    """``modulation=True`` additionally quantizes the in-block AdaLN
    projections (the 6.5 GB stacks that decide whether Hunyuan-13B fits one
    v5e chip — tools/bench_hunyuan_int8.py) with bounded extra drift."""
    from alg_tpu.models.cogvideox import CogVideoXTransformerConfig, init_cogvideox_transformer
    from alg_tpu.models.cogvideox import cogvideox_transformer, cogvideox_rope

    cfg = CogVideoXTransformerConfig(
        num_attention_heads=4, attention_head_dim=32, in_channels=8, out_channels=4,
        time_embed_dim=128, text_embed_dim=128, num_layers=2,
        sample_height=8, sample_width=8, max_text_seq_length=5,
    )
    params = init_cogvideox_transformer(jax.random.PRNGKey(0), cfg)
    qp = quantize_transformer_params(params, modulation=True)
    assert "kernel_q" in qp["blocks"]["norm1"]["linear"]  # now quantized
    assert "kernel_q" in qp["blocks"]["attn"]["to_q"]

    x = jnp.asarray(rng.randn(1, 3, 8, 4, 4).astype(np.float32))
    emb = jnp.asarray(rng.randn(1, 5, 128).astype(np.float32))
    t = jnp.asarray([500.0], jnp.float32)
    cos, sin = cogvideox_rope(cfg, 32, 32, 3)
    fp = np.asarray(cogvideox_transformer(params, cfg, x, emb, t, cos, sin))
    q = np.asarray(cogvideox_transformer(qp, cfg, x, emb, t, cos, sin))
    rms = float(np.sqrt(np.mean(fp**2)))
    assert np.isfinite(q).all()
    assert np.abs(q - fp).mean() < 0.1 * rms, (np.abs(q - fp).mean(), rms)


def test_w4_pack_unpack_roundtrip(rng):
    """int4 nibble packing → w4_to_int8 requant reproduces the reference
    dequantized weights to int8-requant precision."""
    from alg_tpu.ops.quant import quantize_kernel_w4, w4_to_int8

    w = rng.randn(2, 256, 96).astype(np.float32) * 0.05  # stacked [L, in, out]
    kq4, s4, s8 = quantize_kernel_w4(jnp.asarray(w))
    assert kq4.shape == (2, 128, 96) and kq4.dtype == jnp.int8
    assert s4.shape == (2, 2, 96) and s8.shape == (2, 1, 96)

    # reference: group-wise int4 grid in numpy
    wg = w.reshape(2, 2, 128, 96)
    s4_np = np.maximum(np.abs(wg).max(axis=-2, keepdims=True), 1e-12) / 7.0
    q4 = np.clip(np.round(wg / s4_np), -7, 7)
    deq = (q4 * s4_np).reshape(2, 256, 96)

    w8 = np.asarray(w4_to_int8({"kernel_q4": kq4, "w_scale4": s4, "w_scale": s8}))
    assert w8.dtype == np.int8 and np.abs(w8).max() <= 127
    recon = w8.astype(np.float32) * np.asarray(s8)
    # requant adds ≤ half an int8 ulp on top of the int4 grid
    np.testing.assert_allclose(recon, deq, atol=float(np.asarray(s8).max()) * 0.51)
    # and the int4 grid itself is within its own quantization step of w
    assert np.abs(deq - w).max() <= float(s4_np.max()) * 0.5 + 1e-7


def test_w4_quantized_linear_and_tree(rng):
    """W4A8 linear runs through layers.linear dispatch and a w4-quantized
    tiny DiT forward stays close to fp."""
    from alg_tpu.models.cogvideox import (
        CogVideoXTransformerConfig,
        cogvideox_rope,
        cogvideox_transformer,
        init_cogvideox_transformer,
    )
    from alg_tpu.ops.quant import quantize_kernel_w4

    x = rng.randn(3, 17, 256).astype(np.float32)
    w = rng.randn(256, 128).astype(np.float32) * 0.05
    b = rng.randn(128).astype(np.float32)
    kq4, s4, s8 = quantize_kernel_w4(jnp.asarray(w))
    p = {"kernel_q4": kq4, "w_scale4": s4, "w_scale": s8, "bias": jnp.asarray(b)}
    out = np.asarray(L.linear(p, jnp.asarray(x)))
    fp = x @ w + b
    rel = np.abs(out - fp).max() / np.abs(fp).max()
    assert rel < 0.2, rel  # int4 grid: per-weight error doesn't average
    # down relative to signal (~10% RMS on gaussian weights; GPTQ-class
    # calibration would tighten this on real checkpoints)

    cfg = CogVideoXTransformerConfig(
        num_attention_heads=4, attention_head_dim=32, in_channels=8, out_channels=4,
        time_embed_dim=128, text_embed_dim=128, num_layers=2,
        sample_height=8, sample_width=8, max_text_seq_length=5,
    )
    params = init_cogvideox_transformer(jax.random.PRNGKey(0), cfg)
    qp = quantize_transformer_params(params, mode="w4")
    assert "kernel_q4" in qp["blocks"]["attn"]["to_q"]
    assert "kernel" in qp["blocks"]["norm1"]["linear"]  # modulation default: bf16

    xs = jnp.asarray(rng.randn(1, 3, 8, 4, 4).astype(np.float32))
    emb = jnp.asarray(rng.randn(1, 5, 128).astype(np.float32))
    t = jnp.asarray([500.0], jnp.float32)
    cos, sin = cogvideox_rope(cfg, 32, 32, 3)
    fp = np.asarray(cogvideox_transformer(params, cfg, xs, emb, t, cos, sin))
    q = np.asarray(cogvideox_transformer(qp, cfg, xs, emb, t, cos, sin))
    rms = float(np.sqrt(np.mean(fp**2)))
    assert np.isfinite(q).all()
    assert np.abs(q - fp).mean() < 0.15 * rms, (np.abs(q - fp).mean(), rms)


def test_host_init_and_pipeline_mode_w4():
    """The load-time W4A8 path the 14B single-chip bench uses: host-side
    random init + host-side int4 quantization + streaming, and the
    quantize_pipeline(mode=) passthrough."""
    import dataclasses

    from alg_tpu.models.cogvideox import (
        CogVideoXTransformerConfig,
        init_cogvideox_transformer,
    )
    from alg_tpu.ops.quant import host_init_quantized_params

    cfg = CogVideoXTransformerConfig(
        num_attention_heads=4, attention_head_dim=32, in_channels=8, out_channels=4,
        time_embed_dim=128, text_embed_dim=128, num_layers=2,
        sample_height=8, sample_width=8, max_text_seq_length=5,
    )
    params = host_init_quantized_params(
        lambda: init_cogvideox_transformer(jax.random.PRNGKey(0), cfg), mode="w4"
    )
    blk = params["blocks"]["attn"]["to_q"]
    assert blk["kernel_q4"].dtype == jnp.int8  # packed nibbles
    assert blk["kernel_q4"].shape[-2] * 2 == 128
    assert blk["w_scale4"].shape[-2] == 1  # 128-dim in → one group
    assert "kernel" in params["blocks"]["norm1"]["linear"]  # modulation stays fp

    pipe = dataclasses.make_dataclass("P", ["transformer_params"])(
        transformer_params=init_cogvideox_transformer(jax.random.PRNGKey(1), cfg)
    )
    qpipe = quantize_pipeline(pipe, mode="w4")
    assert "kernel_q4" in qpipe.transformer_params["blocks"]["attn"]["to_q"]
    qpipe8 = quantize_pipeline(pipe)
    assert "kernel_q" in qpipe8.transformer_params["blocks"]["attn"]["to_q"]


def test_host_quantize_matches_device_quantize(rng):
    """quantize-before-streaming (io/model_zoo._convert_transformer) must be
    bitwise-identical to quantizing a device-resident tree: same int8 codes,
    same scales, regardless of whether the kernel arrives as host numpy or a
    jax array."""
    import ml_dtypes

    k32 = (rng.randn(2, 256, 384) * 0.05).astype(np.float32)
    for dt in (np.float32, ml_dtypes.bfloat16):
        k = k32.astype(dt)
        tree_host = {"transformer_blocks": {"ff": {"kernel": k}}}
        tree_dev = {"transformer_blocks": {"ff": {"kernel": jnp.asarray(k)}}}
        for mode in ("w8", "w4"):
            qh = quantize_transformer_params(tree_host, mode=mode)
            qd = quantize_transformer_params(tree_dev, mode=mode)
            lh = jax.tree_util.tree_leaves(qh)
            ld = jax.tree_util.tree_leaves(qd)
            assert len(lh) == len(ld)
            for a, b in zip(lh, ld):
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_stream_tree_roundtrip(rng):
    """core.device.stream_tree: numpy leaves land on device bitwise, non-array
    leaves pass through."""
    import ml_dtypes

    from alg_tpu.core.device import stream_tree

    tree = {
        "a": rng.randn(64, 64).astype(np.float32),
        "b": (rng.randn(8) * 3).astype(ml_dtypes.bfloat16),
        "q": np.clip(rng.randn(16, 16) * 50, -127, 127).astype(np.int8),
        "meta": "keep-me",
    }
    out = stream_tree(tree)
    assert out["meta"] == "keep-me"
    for key in ("a", "b", "q"):
        assert isinstance(out[key], jax.Array), key
        np.testing.assert_array_equal(np.asarray(out[key]), tree[key])


def test_host_tree_conversion_matches_device(rng):
    """weights.host_tree(): converters emit bitwise-identical values as host
    numpy (guards the _as/_stack refactor behind quantize-at-load)."""
    import torch

    from alg_tpu.io import weights as W

    state = {
        "layer.weight": torch.tensor(rng.randn(48, 32), dtype=torch.float32),
        "layer.bias": torch.tensor(rng.randn(48), dtype=torch.float32),
    }
    dev = W.linear(state, "layer", jnp.float32)
    with W.host_tree():
        host = W.linear(state, "layer", jnp.float32)
    assert isinstance(host["kernel"], np.ndarray)
    assert isinstance(dev["kernel"], jax.Array)
    np.testing.assert_array_equal(host["kernel"], np.asarray(dev["kernel"]))
    np.testing.assert_array_equal(host["bias"], np.asarray(dev["bias"]))
