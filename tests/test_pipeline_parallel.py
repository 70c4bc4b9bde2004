"""Pipeline parallelism (GPipe over stacked DiT blocks) on the CPU mesh.

Exactness contract: the pp pipeline is the same math as the sequential block
scan — each microbatch row passes through the same layers in the same order —
so sharded forwards/updates must match single-device runs to fp32
reassociation noise (SURVEY §4 item 5 test strategy).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from alg_tpu.ops.attention import set_attention_impl


def _cpu_devices(n):
    if jax.default_backend() != "cpu":
        # the pp shard_map graphs lower against the CPU mesh while closures
        # trace on the default (axon/TPU) backend — jax's mixed-backend
        # lowering cache KeyErrors ('closed_call'). These tests are the CPU
        # runner's job (PYTHONPATH= python -m pytest …); the TPU equivalent
        # is the driver's dryrun_multichip train leg.
        pytest.skip("CPU-mesh pp tests need a cpu default backend")
    cpus = jax.local_devices(backend="cpu")
    if len(cpus) < n:
        pytest.skip(f"need {n} cpu devices, have {len(cpus)}")
    return cpus[:n]


def _cog_cfg(num_layers=4):
    from alg_tpu.models.cogvideox import CogVideoXTransformerConfig

    return CogVideoXTransformerConfig(
        num_attention_heads=4,
        attention_head_dim=16,
        in_channels=8,
        out_channels=4,
        time_embed_dim=16,
        text_embed_dim=12,
        num_layers=num_layers,
        sample_height=8,
        sample_width=8,
        max_text_seq_length=5,
    )


def _cog_forward(cfg, params, batch=4):
    from alg_tpu.models.cogvideox import cogvideox_rope, cogvideox_transformer

    key = jax.random.PRNGKey(1)
    cos, sin = cogvideox_rope(cfg, 32, 32, 2)
    x = jax.random.normal(key, (batch, 2, 8, 4, 4))
    txt = jax.random.normal(jax.random.PRNGKey(2), (batch, 5, 12))
    ts = jnp.full((batch,), 700.0)
    return lambda p: cogvideox_transformer(p, cfg, x, txt, ts, cos, sin)


def test_pp_cogvideox_forward_matches_single_device():
    """pp=4 staged forward == unsharded, incl. n_micro > pp."""
    from alg_tpu.sharding import make_mesh
    from alg_tpu.sharding.partition import add_pp, cogvideox_transformer_specs, shard_params
    from alg_tpu.sharding.pipeline import pipeline_blocks

    cpus = _cpu_devices(8)
    cfg = _cog_cfg(num_layers=4)
    from alg_tpu.models.cogvideox import init_cogvideox_transformer

    with jax.default_device(cpus[0]):
        params = init_cogvideox_transformer(jax.random.PRNGKey(0), cfg)
        fwd = _cog_forward(cfg, params)
        ref = np.asarray(jax.jit(fwd)(params))

        mesh = make_mesh(dp=2, pp=4, devices=cpus)
        specs = add_pp(cogvideox_transformer_specs(params))
        p_sh = shard_params(params, specs, mesh)
        set_attention_impl("xla")
        try:
            for n_micro in (4, 2):
                with mesh, pipeline_blocks(mesh, n_micro=n_micro):
                    out = np.asarray(jax.jit(fwd)(p_sh))
                np.testing.assert_allclose(out, ref, atol=2e-5, err_msg=f"n_micro={n_micro}")
        finally:
            set_attention_impl(None)


def test_pp_wan_forward_matches_single_device():
    from alg_tpu.models.wan import (
        WanTransformerConfig,
        init_wan_transformer,
        wan_rope,
        wan_transformer,
    )
    from alg_tpu.sharding import make_mesh
    from alg_tpu.sharding.partition import add_pp, shard_params, wan_transformer_specs
    from alg_tpu.sharding.pipeline import pipeline_blocks

    cpus = _cpu_devices(8)
    cfg = WanTransformerConfig(
        num_attention_heads=4, attention_head_dim=12, in_channels=12,
        out_channels=4, num_layers=4, ffn_dim=32, freq_dim=16, text_dim=8,
        image_dim=10,
    )
    with jax.default_device(cpus[0]):
        params = init_wan_transformer(jax.random.PRNGKey(0), cfg)
        key = jax.random.PRNGKey(3)
        x = jax.random.normal(key, (2, 12, 2, 4, 4))
        ts = jnp.full((2,), 400.0)
        txt = jax.random.normal(jax.random.PRNGKey(4), (2, 7, 8))
        img = jax.random.normal(jax.random.PRNGKey(5), (2, 5, 10))
        cos, sin = wan_rope(cfg, 2, 4, 4)
        fwd = lambda p: wan_transformer(p, cfg, x, ts, txt, img, cos, sin)
        ref = np.asarray(jax.jit(fwd)(params))

        mesh = make_mesh(pp=2, tp=2, devices=cpus[:4])
        p_sh = shard_params(params, add_pp(wan_transformer_specs(params)), mesh)
        set_attention_impl("xla")
        try:
            with mesh, pipeline_blocks(mesh, n_micro=2):
                out = np.asarray(jax.jit(fwd)(p_sh))
        finally:
            set_attention_impl(None)
        np.testing.assert_allclose(out, ref, atol=2e-5)


def test_pp_hunyuan_forward_matches_single_device():
    """Both stacks (double + single stream) stage over pp."""
    from alg_tpu.models.hunyuan import (
        HunyuanVideoTransformerConfig,
        hunyuan_rope,
        hunyuan_transformer,
        init_hunyuan_transformer,
    )
    from alg_tpu.sharding import make_mesh
    from alg_tpu.sharding.partition import add_pp, hunyuan_transformer_specs, shard_params
    from alg_tpu.sharding.pipeline import pipeline_blocks

    cpus = _cpu_devices(8)
    cfg = HunyuanVideoTransformerConfig(
        in_channels=4, out_channels=4, num_attention_heads=4, attention_head_dim=8,
        num_layers=2, num_single_layers=2, num_refiner_layers=1, mlp_ratio=2.0,
        text_embed_dim=12, pooled_projection_dim=6, rope_axes_dim=(2, 4, 2),
    )
    with jax.default_device(cpus[0]):
        params = init_hunyuan_transformer(jax.random.PRNGKey(0), cfg)
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 2, 4, 4))
        ts = jnp.full((2,), 600.0)
        txt = jax.random.normal(jax.random.PRNGKey(2), (2, 7, 12))
        mask = jnp.ones((2, 7), jnp.int32)
        pooled = jax.random.normal(jax.random.PRNGKey(3), (2, 6))
        cos, sin = hunyuan_rope(cfg, 2, 4, 4)
        fwd = lambda p: hunyuan_transformer(p, cfg, x, ts, txt, mask, pooled, rope_cos=cos, rope_sin=sin)
        ref = np.asarray(jax.jit(fwd)(params))

        mesh = make_mesh(pp=2, devices=cpus[:2])
        p_sh = shard_params(params, add_pp(hunyuan_transformer_specs(params)), mesh)
        set_attention_impl("xla")
        try:
            with mesh, pipeline_blocks(mesh, n_micro=2):
                out = np.asarray(jax.jit(fwd)(p_sh))
        finally:
            set_attention_impl(None)
        np.testing.assert_allclose(out, ref, atol=2e-5)


def test_pp_train_step_matches_single_device():
    """dp=2 × pp=2 × tp=2 GPipe train step == unsharded update (2 steps)."""
    from alg_tpu.models.cogvideox import init_cogvideox_transformer
    from alg_tpu.sharding import make_mesh
    from alg_tpu.sharding.partition import cogvideox_transformer_specs
    from alg_tpu.training import (
        TrainConfig,
        make_cogvideox_vpred_loss,
        make_sharded_train_step,
        make_train_step,
        shard_batch,
    )

    cpus = _cpu_devices(8)
    cfg = _cog_cfg(num_layers=4)
    with jax.default_device(cpus[0]):
        params = init_cogvideox_transformer(jax.random.PRNGKey(0), cfg)
        loss_fn = make_cogvideox_vpred_loss(cfg)
        tc = TrainConfig(learning_rate=1e-3, eps=1e-2, remat=True)
        rng = np.random.RandomState(5)
        # loss concatenates latents (out_channels) + image_latents on the
        # channel axis to form the in_channels=8 model input
        batch = {
            "latents": jnp.asarray(rng.randn(4, 2, 4, 4, 4).astype(np.float32)),
            "image_latents": jnp.asarray(rng.randn(4, 2, 4, 4, 4).astype(np.float32)),
            "encoder_hidden_states": jnp.asarray(rng.randn(4, 5, 12).astype(np.float32)),
        }
        key = jax.random.PRNGKey(9)

        step, opt = make_train_step(loss_fn, tc)
        p_ref, o_ref, m_ref = jax.jit(step)(params, opt.init(params), batch, key)
        key2 = jax.random.PRNGKey(10)
        p_ref, _, m_ref2 = jax.jit(step)(p_ref, o_ref, batch, key2)

        mesh = make_mesh(dp=2, pp=2, tp=2, devices=cpus)
        specs = cogvideox_transformer_specs(params)
        with mesh:
            jstep, p_sh, o_sh = make_sharded_train_step(
                loss_fn, tc, mesh, params, specs, pp_micro=2
            )
            b_sh = shard_batch(batch, mesh)
            p_sh, o_sh, m_sh = jstep(p_sh, o_sh, b_sh, key)
            p_sh, _, m_sh2 = jstep(p_sh, o_sh, b_sh, key2)

        np.testing.assert_allclose(
            float(m_sh["loss"]), float(m_ref["loss"]), rtol=1e-5
        )
        np.testing.assert_allclose(
            float(m_sh2["loss"]), float(m_ref2["loss"]), rtol=1e-4
        )
        for a, b in zip(jax.tree.leaves(p_sh), jax.tree.leaves(p_ref)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5)


def test_pp_validation_errors():
    from alg_tpu.sharding import make_mesh
    from alg_tpu.sharding.pipeline import pipeline_blocks, run_blocks

    cpus = _cpu_devices(2)
    mesh = make_mesh(pp=2, devices=cpus[:2])
    blocks = {"k": jnp.zeros((3, 4, 4))}  # 3 layers not divisible by pp=2
    body = lambda c, bp, ctx, consts: c

    with pipeline_blocks(mesh):
        with pytest.raises(ValueError, match="not divisible by pp"):
            run_blocks(body, jnp.zeros((2, 4)), blocks)
        with pytest.raises(ValueError, match="not divisible by n_micro"):
            run_blocks(body, jnp.zeros((3, 4)), {"k": jnp.zeros((2, 4, 4))})
