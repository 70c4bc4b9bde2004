"""Sharding tests on the virtual 8-device CPU mesh (SURVEY §4 item 5)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P


def _cpu_devices(n):
    cpus = jax.local_devices(backend="cpu")
    if len(cpus) < n:
        pytest.skip(f"need {n} cpu devices, have {len(cpus)}")
    return cpus[:n]


def test_mesh_construction():
    from alg_tpu.sharding import make_mesh

    mesh = make_mesh(dp=2, tp=4, devices=_cpu_devices(8))
    assert mesh.axis_names == ("dp", "tp")
    assert mesh.devices.shape == (2, 4)


def test_tp_sharded_dit_matches_single_device():
    """The TP+DP-sharded DiT forward must produce the same numbers as the
    unsharded one (GSPMD correctness for our partition specs)."""
    from alg_tpu.models.cogvideox import (
        CogVideoXTransformerConfig,
        cogvideox_rope,
        cogvideox_transformer,
        init_cogvideox_transformer,
    )
    from alg_tpu.ops.attention import set_attention_impl
    from alg_tpu.sharding import cogvideox_transformer_specs, make_mesh

    cfg = CogVideoXTransformerConfig(
        num_attention_heads=4,
        attention_head_dim=16,
        in_channels=8,
        out_channels=4,
        time_embed_dim=16,
        text_embed_dim=12,
        num_layers=2,
        sample_height=8,
        sample_width=8,
        max_text_seq_length=5,
    )
    cpus = _cpu_devices(8)
    key = jax.random.PRNGKey(0)
    with jax.default_device(cpus[0]):
        params = init_cogvideox_transformer(key, cfg)
        cos, sin = cogvideox_rope(cfg, 32, 32, 2)
        x = jax.random.normal(key, (2, 2, 8, 4, 4))
        txt = jax.random.normal(key, (2, 5, 12))
        ts = jnp.array([700.0, 700.0])

        set_attention_impl("xla")
        try:
            ref = cogvideox_transformer(params, cfg, x, txt, ts, cos, sin)

            mesh = make_mesh(dp=2, tp=4, devices=cpus)
            specs = cogvideox_transformer_specs(params)
            params_sh = jax.tree.map(
                lambda p, s: jax.device_put(p, NamedSharding(mesh, s)), params, specs
            )
            data = NamedSharding(mesh, P("dp"))
            x_sh = jax.device_put(x, data)
            txt_sh = jax.device_put(txt, data)

            fn = jax.jit(lambda p, x, t, ts: cogvideox_transformer(p, cfg, x, t, ts, cos, sin))
            with mesh:
                out = fn(params_sh, x_sh, txt_sh, ts)
            np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
        finally:
            set_attention_impl(None)


def test_dryrun_multichip_entry():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_sharded_batched_serving():
    """BASELINE config #5: batched multi-prompt generation with the DiT
    TP-sharded over a mesh — full pipeline run, numerics vs unsharded."""
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

    cpus = _cpu_devices(8)
    with jax.default_device(cpus[0]):
        tcfg = CogVideoXTransformerConfig(
            num_attention_heads=4,
            attention_head_dim=16,
            in_channels=8,
            out_channels=4,
            time_embed_dim=16,
            text_embed_dim=12,
            num_layers=2,
            sample_height=4,
            sample_width=4,
            max_text_seq_length=5,
        )
        vcfg = CogVideoXVAEConfig(
            block_out_channels=(8, 16, 16, 32), latent_channels=4, layers_per_block=1, norm_num_groups=4
        )
        pipe = CogVideoXPipeline(
            transformer_cfg=tcfg,
            transformer_params=init_cogvideox_transformer(jax.random.PRNGKey(0), tcfg),
            vae_cfg=vcfg,
            vae_params=init_cogvideox_vae(jax.random.PRNGKey(1), vcfg),
        )
        pipe.encode_prompt = lambda prompts, max_len=226: jnp.asarray(
            np.random.RandomState(3).randn(len(prompts), 5, 12).astype(np.float32)
        )
        rng = np.random.RandomState(7)
        reqs = [
            BatchRequest(prompt="a", image=rng.rand(1, 3, 32, 32).astype(np.float32) * 2 - 1, seed=42),
            BatchRequest(prompt="b", image=rng.rand(1, 3, 32, 32).astype(np.float32) * 2 - 1, seed=7),
        ]
        kwargs = dict(height=32, width=32, num_frames=5, num_inference_steps=2, guidance_scale=6.0, output_type="latent")

        set_attention_impl("xla")
        try:
            ref = serve_batch(pipe, reqs, **kwargs)
            mesh = make_mesh(dp=2, tp=4, devices=cpus)
            pipe_sh = shard_pipeline(pipe, mesh)
            pipe_sh.encode_prompt = pipe.encode_prompt  # test stub survives replace
            with mesh:
                out = serve_batch(pipe_sh, reqs, **kwargs)
        finally:
            set_attention_impl(None)
        assert out.shape == (2, 2, 4, 4, 4)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)
