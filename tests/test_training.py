"""Training tier tests (beyond-parity: the reference is inference-only).

Covers: loss descent (overfit a fixed tiny batch) for all three family
objectives, remat numerics, gradient-accumulation equivalence, mesh-sharded
train step vs single-device, and LoRA fine-tuning (frozen base, peft-layout
round-trip through io/lora's merge path).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from alg_tpu.models.cogvideox import CogVideoXTransformerConfig, init_cogvideox_transformer
from alg_tpu.training import (
    TrainConfig,
    apply_lora,
    init_lora_params,
    make_cogvideox_vpred_loss,
    make_hunyuan_flow_loss,
    make_lora_loss,
    make_sharded_train_step,
    make_train_step,
    make_wan_flow_loss,
    shard_batch,
    to_peft_state,
)

def _tiny_cog_cfg(num_layers=2, heads=4):
    return CogVideoXTransformerConfig(
        num_attention_heads=heads, attention_head_dim=16, in_channels=8,
        out_channels=4, time_embed_dim=16, text_embed_dim=12, num_layers=num_layers,
        sample_height=4, sample_width=4, max_text_seq_length=4,
        use_rotary_positional_embeddings=False,
    )


def _cog_batch(b=2, seed=0):
    rng = np.random.RandomState(seed)
    return {
        "latents": jnp.asarray(rng.randn(b, 2, 4, 8, 8).astype(np.float32)),
        "image_latents": jnp.asarray(rng.randn(b, 2, 4, 8, 8).astype(np.float32)),
        "encoder_hidden_states": jnp.asarray(rng.randn(b, 3, 12).astype(np.float32)),
    }


def _run_steps(step, params, opt_state, batch, n, seed=0):
    losses = []
    for i in range(n):
        params, opt_state, m = step(params, opt_state, batch, jax.random.fold_in(jax.random.PRNGKey(seed), i))
        losses.append(float(m["loss"]))
    return params, opt_state, losses


def test_cogvideox_vpred_overfit():
    cfg = _tiny_cog_cfg()
    params = init_cogvideox_transformer(jax.random.PRNGKey(0), cfg)
    loss_fn = make_cogvideox_vpred_loss(cfg)
    step, opt = make_train_step(loss_fn, TrainConfig(learning_rate=2e-3))
    step = jax.jit(step)
    opt_state = opt.init(params)
    batch = _cog_batch()
    _, _, losses = _run_steps(step, params, opt_state, batch, 40)
    assert np.isfinite(losses).all()
    # fixed batch + per-step fresh noise: the DiT learns the v-target structure
    assert np.mean(losses[-5:]) < 0.5 * np.mean(losses[:5]), losses


def test_remat_matches_no_remat():
    cfg = _tiny_cog_cfg()
    params = init_cogvideox_transformer(jax.random.PRNGKey(0), cfg)
    loss_fn = make_cogvideox_vpred_loss(cfg)
    batch = _cog_batch()
    key = jax.random.PRNGKey(3)

    step_a, opt = make_train_step(loss_fn, TrainConfig())
    step_b, _ = make_train_step(loss_fn, TrainConfig(remat=True))
    opt_state = opt.init(params)
    pa, _, ma = jax.jit(step_a)(params, opt_state, batch, key)
    pb, _, mb = jax.jit(step_b)(params, opt_state, batch, key)
    assert np.allclose(float(ma["loss"]), float(mb["loss"]), rtol=1e-6)
    for la, lb in zip(jax.tree.leaves(pa), jax.tree.leaves(pb)):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb), atol=1e-6)


def test_grad_accumulation_matches_explicit_mean():
    """accum_steps=2 == mean of the two micro-batch grads (same keys) fed to
    the same optimizer."""
    import optax

    cfg = _tiny_cog_cfg(num_layers=1)
    params = init_cogvideox_transformer(jax.random.PRNGKey(0), cfg)
    loss_fn = make_cogvideox_vpred_loss(cfg)
    # large eps: AdamW's update is sign-like (lr·g/(√g²+eps)), so leaves with
    # ~1e-10 noise-level grads would flip update signs between the two
    # evaluation orders; eps=1e-2 makes noise-grad updates negligible while
    # real grads still produce comparable updates.
    tc = TrainConfig(learning_rate=1e-3, accum_steps=2, eps=1e-2)
    step, opt = make_train_step(loss_fn, tc)
    opt_state = opt.init(params)
    batch = _cog_batch(b=4)
    key = jax.random.PRNGKey(9)
    p_acc, _, m_acc = jax.jit(step)(params, opt_state, batch, key)

    # explicit: micro-batches are the leading-axis halves, keys = split(key, 2)
    keys = jax.random.split(key, 2)
    micro = jax.tree.map(lambda x: x.reshape((2, 2) + x.shape[1:]), batch)
    grads, losses = [], []
    for i in range(2):
        mb = jax.tree.map(lambda x: x[i], micro)
        l, g = jax.value_and_grad(loss_fn)(params, mb, keys[i])
        losses.append(l)
        grads.append(g)
    g_mean = jax.tree.map(lambda a, b: (a + b) / 2.0, *grads)
    updates, _ = opt.update(g_mean, opt_state, params)
    p_ref = optax.apply_updates(params, updates)

    assert np.allclose(float(m_acc["loss"]), float((losses[0] + losses[1]) / 2), rtol=1e-6)
    for la, lb in zip(jax.tree.leaves(p_acc), jax.tree.leaves(p_ref)):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb), atol=1e-6)


def test_wan_flow_overfit():
    from alg_tpu.models.wan import WanTransformerConfig, init_wan_transformer

    cfg = WanTransformerConfig(
        num_attention_heads=2, attention_head_dim=12, in_channels=12, out_channels=4,
        num_layers=2, ffn_dim=32, freq_dim=16, text_dim=8, image_dim=10,
    )
    params = init_wan_transformer(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(1)
    batch = {
        "latents": jnp.asarray(rng.randn(2, 4, 2, 8, 8).astype(np.float32)),
        "condition": jnp.asarray(rng.randn(2, 8, 2, 8, 8).astype(np.float32)),
        "encoder_hidden_states": jnp.asarray(rng.randn(2, 5, 8).astype(np.float32)),
        "encoder_hidden_states_image": jnp.asarray(rng.randn(2, 5, 10).astype(np.float32)),
    }
    loss_fn = make_wan_flow_loss(cfg, shift=5.0)
    step, opt = make_train_step(loss_fn, TrainConfig(learning_rate=2e-3))
    _, _, losses = _run_steps(jax.jit(step), params, opt.init(params), batch, 40)
    assert np.isfinite(losses).all()
    assert np.mean(losses[-5:]) < 0.7 * np.mean(losses[:5]), losses


def test_hunyuan_flow_overfit_token_replace():
    from alg_tpu.models.hunyuan import (
        HunyuanVideoTransformerConfig,
        init_hunyuan_transformer,
    )

    cfg = HunyuanVideoTransformerConfig(
        in_channels=4, out_channels=4, num_attention_heads=2, attention_head_dim=8,
        num_layers=1, num_single_layers=1, num_refiner_layers=1, mlp_ratio=2.0,
        text_embed_dim=12, pooled_projection_dim=6, rope_axes_dim=(2, 4, 2),
    )
    assert cfg.image_condition_type == "token_replace"
    params = init_hunyuan_transformer(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(2)
    batch = {
        "latents": jnp.asarray(rng.randn(2, 4, 2, 8, 8).astype(np.float32)),
        "image_latents": jnp.asarray(rng.randn(2, 4, 1, 8, 8).astype(np.float32)),
        "encoder_hidden_states": jnp.asarray(rng.randn(2, 5, 12).astype(np.float32)),
        "encoder_attention_mask": jnp.asarray(np.ones((2, 5), np.int32)),
        "pooled_projections": jnp.asarray(rng.randn(2, 6).astype(np.float32)),
    }
    loss_fn = make_hunyuan_flow_loss(cfg, shift=7.0)
    step, opt = make_train_step(loss_fn, TrainConfig(learning_rate=5e-3))
    _, _, losses = _run_steps(jax.jit(step), params, opt.init(params), batch, 80)
    assert np.isfinite(losses).all()
    assert np.mean(losses[-5:]) < 0.75 * np.mean(losses[:5]), losses


def test_mixed_precision_bf16_compute_fp32_masters():
    """compute_dtype=bf16: forward runs in bf16, params/moments stay fp32
    masters, and the bf16 loss tracks the fp32 loss."""
    cfg = _tiny_cog_cfg()
    params = init_cogvideox_transformer(jax.random.PRNGKey(0), cfg)
    batch = _cog_batch()
    key = jax.random.PRNGKey(4)

    loss32 = make_cogvideox_vpred_loss(cfg)
    loss16 = make_cogvideox_vpred_loss(cfg, compute_dtype=jnp.bfloat16)
    l32, l16 = float(loss32(params, batch, key)), float(loss16(params, batch, key))
    assert np.isfinite(l16)
    assert abs(l16 - l32) < 0.05 * abs(l32) + 0.05, (l16, l32)

    step, opt = make_train_step(loss16, TrainConfig(learning_rate=1e-3))
    p, o, m = jax.jit(step)(params, opt.init(params), batch, key)
    assert np.isfinite(float(m["loss"]))
    for leaf in jax.tree.leaves(p):
        assert leaf.dtype == jnp.float32  # masters never leave fp32
    # gradients actually flowed through the cast
    moved = any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(p), jax.tree.leaves(params))
    )
    assert moved


def test_sharded_train_step_matches_single_device():
    """dp=2 × tp=2 mesh-sharded train step == unsharded, 2 steps."""
    from alg_tpu.sharding import make_mesh
    from alg_tpu.sharding.partition import cogvideox_transformer_specs

    cfg = _tiny_cog_cfg()
    params = init_cogvideox_transformer(jax.random.PRNGKey(0), cfg)
    loss_fn = make_cogvideox_vpred_loss(cfg)
    tc = TrainConfig(learning_rate=1e-3, eps=1e-2)  # see accumulation test on eps
    batch = _cog_batch(b=2)

    step, opt = make_train_step(loss_fn, tc)
    p_ref, o_ref, losses_ref = _run_steps(jax.jit(step), params, opt.init(params), batch, 2, seed=5)

    cpus = jax.local_devices(backend="cpu")
    mesh = make_mesh(dp=2, sp=1, tp=2, devices=cpus[:4])
    specs = cogvideox_transformer_specs(params)
    with mesh:
        jstep, p_sh, o_sh = make_sharded_train_step(loss_fn, tc, mesh, params, specs)
        b_sh = shard_batch(batch, mesh)
        losses_sh = []
        for i in range(2):
            p_sh, o_sh, m = jstep(p_sh, o_sh, b_sh, jax.random.fold_in(jax.random.PRNGKey(5), i))
            losses_sh.append(float(m["loss"]))

    np.testing.assert_allclose(losses_sh, losses_ref, rtol=1e-5)
    for la, lb in zip(jax.tree.leaves(p_sh), jax.tree.leaves(p_ref)):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb), atol=2e-5)


def _train_cli(tmp_path, family, build, merge, load, extra_yaml=""):
    """Drive ``alg-tpu-train`` end-to-end on a tiny checkpoint with synthetic
    latents, then merge the saved peft adapters back through io/lora."""
    import os
    import subprocess
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import make_tiny_checkpoint

    # family dispatch is by path substring (reference run.py:45-86 quirk)
    root = tmp_path / {"cogvideox": "CogVideoX-tiny", "wan": "Wan-tiny",
                       "hunyuan": "HunyuanVideo-tiny"}[family]
    getattr(make_tiny_checkpoint, build)(str(root))
    cfg_path = tmp_path / "train.yaml"
    cfg_path.write_text(
        f"""
model:
  path: "{root}"
  dtype: "float32"
generation:
  height: 32
  width: 32
  num_frames: 5
  guidance_scale: 6.0
  max_sequence_length: 8
{extra_yaml}video:
  fps: 8
"""
    )
    out_path = tmp_path / "adapters.npz"
    env = dict(os.environ, JAX_COMPILATION_CACHE_DIR="/root/.cache/jax_tpu_cache")
    proc = subprocess.run(
        [sys.executable, "-m", "alg_tpu.train_cli", "--config", str(cfg_path),
         "--synthetic", "4", "--steps", "4", "--batch_size", "2", "--rank", "2",
         "--lr", "1e-3", "--log_every", "2", "--output", str(out_path)],
        cwd=os.path.join(os.path.dirname(__file__), ".."),
        capture_output=True, text=True, env=env, timeout=1200,
    )
    assert proc.returncode == 0, proc.stdout[-3000:] + proc.stderr[-3000:]
    assert "Training complete." in proc.stdout
    assert out_path.exists()

    # adapters merge cleanly into the same checkpoint's transformer
    from alg_tpu.io import lora as io_lora

    pipe = load(str(root), dtype=jnp.float32)
    state = dict(np.load(out_path))
    merged = getattr(io_lora, merge)(pipe.transformer_params, state, scale=1.0)
    assert jax.tree.structure(merged) == jax.tree.structure(pipe.transformer_params)
    return proc.stdout


def test_train_cli_cogvideox(tmp_path):
    from alg_tpu.io.model_zoo import load_cogvideox_pipeline

    _train_cli(tmp_path, "cogvideox", "build", "merge_lora_cogvideox", load_cogvideox_pipeline)


def test_train_cli_wan(tmp_path):
    from alg_tpu.io.model_zoo import load_wan_pipeline

    _train_cli(tmp_path, "wan", "build_wan", "merge_lora_wan", load_wan_pipeline)


def test_train_cli_hunyuan(tmp_path):
    from alg_tpu.io.model_zoo import load_hunyuan_pipeline

    _train_cli(tmp_path, "hunyuan", "build_hunyuan", "merge_lora_hunyuan", load_hunyuan_pipeline)


def test_save_load_params_npz_roundtrip(tmp_path):
    from alg_tpu.training import load_params_npz, save_params_npz

    cfg = _tiny_cog_cfg(num_layers=1)
    params = init_cogvideox_transformer(jax.random.PRNGKey(0), cfg)
    path = str(tmp_path / "params.npz")
    save_params_npz(path, params)
    like = init_cogvideox_transformer(jax.random.PRNGKey(7), cfg)
    loaded = load_params_npz(path, like)
    for a, b in zip(jax.tree.leaves(loaded), jax.tree.leaves(params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_lora_training_freezes_base_and_roundtrips_to_peft():
    from alg_tpu.io.lora import merge_lora_cogvideox
    from alg_tpu.training import COGVIDEOX_PEFT_PATHS

    cfg = _tiny_cog_cfg()
    base = init_cogvideox_transformer(jax.random.PRNGKey(0), cfg)
    base_copy = jax.tree.map(lambda x: np.asarray(x).copy(), base)
    loss_fn = make_cogvideox_vpred_loss(cfg)
    batch = _cog_batch()

    loras = init_lora_params(jax.random.PRNGKey(1), base, rank=4,
                             targets=("to_q", "to_k", "to_v", "to_out", "fc_in", "fc_out"))
    # B = 0 ⇒ adapted model starts exactly at the base model
    k = jax.random.PRNGKey(2)
    l_base = float(loss_fn(base, batch, k))
    l_lora0 = float(make_lora_loss(loss_fn, base)(loras, batch, k))
    assert np.allclose(l_base, l_lora0, rtol=1e-6)

    # B=0 at init makes dL/dA zero on step 1 (grads flow through B first), so
    # descent starts slowly — more steps, higher lr than the full-params test.
    step, opt = make_train_step(make_lora_loss(loss_fn, base), TrainConfig(learning_rate=1e-2, weight_decay=0.0))
    loras_t, _, losses = _run_steps(jax.jit(step), loras, opt.init(loras), batch, 60)
    assert np.mean(losses[-5:]) < 0.9 * np.mean(losses[:5]), losses
    # the base tree never moves
    for la, lb in zip(jax.tree.leaves(base), jax.tree.leaves(base_copy)):
        np.testing.assert_array_equal(np.asarray(la), lb)
    # adapters actually trained
    assert any(float(jnp.abs(ab["B"]).max()) > 0 for ab in loras_t.values())

    # peft export → io/lora merge == apply_lora
    state = to_peft_state(loras_t, COGVIDEOX_PEFT_PATHS)
    merged_io = merge_lora_cogvideox(jax.tree.map(jnp.asarray, base), state, scale=1.0)
    merged_tr = apply_lora(base, loras_t, scale=1.0)
    for la, lb in zip(jax.tree.leaves(merged_io), jax.tree.leaves(merged_tr)):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb), atol=1e-5)


def test_attach_lora_matches_apply_lora():
    """Attached adapters (lora_A/lora_B leaves read by models.layers.linear)
    are the same function as merged adapters: x·(W + A·B·s) = x·W + (x·A)·(B·s)."""
    from alg_tpu.training import attach_lora  # noqa: F401 (public export)

    cfg = _tiny_cog_cfg()
    base = init_cogvideox_transformer(jax.random.PRNGKey(0), cfg)
    loras = init_lora_params(jax.random.PRNGKey(1), base, rank=4)
    loras = jax.tree.map(lambda x: x + 0.03, loras)  # nonzero B → nonzero delta
    loss_fn = make_cogvideox_vpred_loss(cfg)
    batch = _cog_batch()
    k = jax.random.PRNGKey(5)
    l_merge = float(make_lora_loss(loss_fn, base, scale=0.7, attach=False)(loras, batch, k))
    l_attach = float(make_lora_loss(loss_fn, base, scale=0.7, attach=True)(loras, batch, k))
    assert np.allclose(l_merge, l_attach, rtol=1e-5), (l_merge, l_attach)


@pytest.mark.parametrize("mode", ["w8", "w4"])
def test_qlora_trains_over_quantized_base(mode):
    """QLoRA: adapters train over a FROZEN W8A8/W4A8 base. make_lora_loss
    auto-detects the quantized base and attaches (never merges) the adapters;
    gradients reach EVERY layer's adapters through the downstream quantized
    linears via the dequantized-weight custom VJP (ops/quant.py)."""
    from alg_tpu.ops.quant import quantize_transformer_params
    from alg_tpu.training import has_quantized_kernels

    # inner dim 128 / fc 512 so the block linears clear ops.quant's
    # _is_big_linear threshold (and w4's group-128 IN-divisibility)
    cfg = CogVideoXTransformerConfig(
        num_attention_heads=4, attention_head_dim=32, in_channels=8,
        out_channels=4, time_embed_dim=16, text_embed_dim=12, num_layers=2,
        sample_height=4, sample_width=4, max_text_seq_length=4,
        use_rotary_positional_embeddings=False,
    )
    base = init_cogvideox_transformer(jax.random.PRNGKey(0), cfg)
    qbase = quantize_transformer_params(base, mode=mode)
    assert has_quantized_kernels(qbase)
    q_copy = jax.tree.map(lambda x: np.asarray(x).copy(), qbase)
    loss_fn = make_cogvideox_vpred_loss(cfg)
    batch = _cog_batch()
    targets = ("to_q", "to_k", "to_v", "to_out", "fc_in", "fc_out")

    # the quantized tree yields the same adapter set (and shapes) as bf16
    loras = init_lora_params(jax.random.PRNGKey(1), qbase, rank=4, targets=targets)
    ref_loras = init_lora_params(jax.random.PRNGKey(1), base, rank=4, targets=targets)
    assert set(loras) == set(ref_loras)
    for path in loras:
        assert loras[path]["A"].shape == ref_loras[path]["A"].shape, path
        assert loras[path]["B"].shape == ref_loras[path]["B"].shape, path

    # B=0 ⇒ the adapted quantized model starts exactly at the quantized base
    k = jax.random.PRNGKey(2)
    ql_loss = make_lora_loss(loss_fn, qbase)  # auto: attach (QLoRA)
    assert np.allclose(float(loss_fn(qbase, batch, k)), float(ql_loss(loras, batch, k)), rtol=1e-6)

    step, opt = make_train_step(ql_loss, TrainConfig(learning_rate=1e-2, weight_decay=0.0))
    loras_t, _, losses = _run_steps(jax.jit(step), loras, opt.init(loras), batch, 60)
    assert np.isfinite(losses).all()
    assert np.mean(losses[-5:]) < 0.9 * np.mean(losses[:5]), losses
    # every adapter of every stacked layer moved — incl. layer 0 behind the
    # downstream quantized linears (the custom VJP carries the gradient)
    for path, ab in loras_t.items():
        b = np.abs(np.asarray(ab["B"]))
        per_layer = b.reshape(b.shape[0], -1).max(axis=-1) if b.ndim == 3 else b.max(keepdims=True)
        assert (per_layer > 0).all(), path
    # the frozen base never moves
    for la, lb in zip(jax.tree.leaves(qbase), jax.tree.leaves(q_copy)):
        np.testing.assert_array_equal(np.asarray(la), lb)


def test_train_cli_random_init_qlora(tmp_path, monkeypatch):
    """``--random_init --quantize w8``: the no-egress hardware-validation path
    — full-size random weights (tiny-patched here), host-side quantization
    before streaming, QLoRA adapters trained and saved through the shipped
    CLI. This is the exact command shape of the TPU training proof
    (docs/TRAINING.md)."""
    import alg_tpu.models.cogvideox as cog_mod
    import alg_tpu.train_cli as tcli

    # random_init_pipeline constructs the family default (full-size) config;
    # patch it tiny for CPU
    monkeypatch.setattr(cog_mod, "CogVideoXTransformerConfig", _tiny_cog_cfg)
    cfg_path = tmp_path / "t.yaml"
    cfg_path.write_text(
        """
model:
  path: "CogVideoX-random"  # never loaded with --random_init; family dispatch only
  dtype: "float32"
generation:
  height: 32
  width: 32
  num_frames: 5
  guidance_scale: 6.0
  max_sequence_length: 8
video:
  fps: 8
"""
    )
    out = tmp_path / "adapters.npz"
    tcli.main([
        "--config", str(cfg_path), "--random_init", "--quantize", "w8",
        "--synthetic", "4", "--steps", "3", "--batch_size", "2",
        "--rank", "2", "--lr", "1e-3", "--output", str(out),
    ])
    assert out.exists()
    state = dict(np.load(out))
    assert state and any(".lora_A." in k or "lora_A" in k for k in state), list(state)[:5]


def test_lora_loss_base_as_call_argument_matches_closure():
    """The train CLI passes the frozen base as a jitted-step ARGUMENT
    (make_lora_loss(loss_fn, None, attach=...)): a closure-captured base is
    serialized into the lowered program as constants — minutes of host time
    and a second HBM copy at 13-14B scale. Both modes must be the same
    function, through make_train_step's trailing-arg pass-through."""
    cfg = _tiny_cog_cfg()
    base = init_cogvideox_transformer(jax.random.PRNGKey(0), cfg)
    loras = init_lora_params(jax.random.PRNGKey(1), base, rank=4)
    loras = jax.tree.map(lambda x: x + 0.02, loras)
    loss_fn = make_cogvideox_vpred_loss(cfg)
    batch = _cog_batch()
    k = jax.random.PRNGKey(3)

    closure = make_lora_loss(loss_fn, base)
    callarg = make_lora_loss(loss_fn, None, attach=False)
    assert np.allclose(float(closure(loras, batch, k)), float(callarg(loras, batch, k, base)), rtol=1e-6)
    with pytest.raises(ValueError):
        make_lora_loss(loss_fn, None)  # attach is required without a base

    tc = TrainConfig(learning_rate=1e-2, weight_decay=0.0)
    step_c, opt = make_train_step(closure, tc)
    step_a, _ = make_train_step(callarg, tc)
    jc, ja = jax.jit(step_c), jax.jit(step_a)
    lc, oc = jc(loras, opt.init(loras), batch, k)[:2]
    la, oa = ja(loras, opt.init(loras), batch, k, base)[:2]
    for x, y in zip(jax.tree.leaves(lc), jax.tree.leaves(la)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-4)

    # accumulation threads the trailing base through the scan body too
    tc2 = TrainConfig(learning_rate=1e-2, weight_decay=0.0, accum_steps=2)
    step_c2, opt2 = make_train_step(closure, tc2)
    step_a2, _ = make_train_step(callarg, tc2)
    b2 = {kk: np.concatenate([v, v]) for kk, v in batch.items()}
    lc2 = jax.jit(step_c2)(loras, opt2.init(loras), b2, k)[0]
    la2 = jax.jit(step_a2)(loras, opt2.init(loras), b2, k, base)[0]
    for x, y in zip(jax.tree.leaves(lc2), jax.tree.leaves(la2)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-4)
