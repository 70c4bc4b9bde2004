"""Training checkpoint/resume, EMA, and the prefetching data pipeline.

Resume contract: save at step k, restore, continue — the final params must be
BIT-IDENTICAL to an uninterrupted run (state round-trips exactly and the data
order generator skips without re-drawing).
"""

import os
import subprocess
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from alg_tpu.models.cogvideox import CogVideoXTransformerConfig, init_cogvideox_transformer
from alg_tpu.training import (
    LatentDataset,
    TrainConfig,
    checkpoint_path,
    init_ema,
    latest_checkpoint,
    load_train_state,
    make_cogvideox_vpred_loss,
    make_ema_update,
    make_train_step,
    prefetch,
    prune_checkpoints,
    save_train_state,
)


def _tiny_cfg():
    return CogVideoXTransformerConfig(
        num_attention_heads=2, attention_head_dim=8, in_channels=8, out_channels=4,
        time_embed_dim=8, text_embed_dim=6, num_layers=2, sample_height=4,
        sample_width=4, max_text_seq_length=3,
    )


def _batch(seed, b=2):
    rng = np.random.RandomState(seed)
    return {
        "latents": jnp.asarray(rng.randn(b, 2, 4, 4, 4).astype(np.float32)),
        "image_latents": jnp.asarray(rng.randn(b, 2, 4, 4, 4).astype(np.float32)),
        "encoder_hidden_states": jnp.asarray(rng.randn(b, 3, 6).astype(np.float32)),
    }


def test_resume_is_bit_exact(tmp_path):
    """4 straight steps == 2 steps → save → load → 2 steps."""
    cfg = _tiny_cfg()
    params = init_cogvideox_transformer(jax.random.PRNGKey(0), cfg)
    loss = make_cogvideox_vpred_loss(cfg)
    step, opt = make_train_step(loss, TrainConfig(learning_rate=1e-3))
    jstep = jax.jit(step)
    keys = [jax.random.fold_in(jax.random.PRNGKey(7), i) for i in range(4)]
    batches = [_batch(i) for i in range(4)]

    p, o = params, opt.init(params)
    for i in range(4):
        p, o, _ = jstep(p, o, batches[i], keys[i])

    q, r = params, opt.init(params)
    for i in range(2):
        q, r, _ = jstep(q, r, batches[i], keys[i])
    path = str(tmp_path / "ck.npz")
    save_train_state(path, 2, q, r)
    s, q2, r2, ema = load_train_state(path, params, opt.init(params))
    assert s == 2 and ema is None
    for i in range(2, 4):
        q2, r2, _ = jstep(q2, r2, batches[i], keys[i])

    for a, b in zip(jax.tree.leaves(p), jax.tree.leaves(q2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_ema_matches_manual_and_roundtrips(tmp_path):
    cfg = _tiny_cfg()
    params = init_cogvideox_transformer(jax.random.PRNGKey(1), cfg)
    loss = make_cogvideox_vpred_loss(cfg)
    step, opt = make_train_step(loss, TrainConfig(learning_rate=1e-2))
    jstep = jax.jit(step)
    ema_fn = make_ema_update(0.9)

    p, o = params, opt.init(params)
    ema = init_ema(p)
    manual = jax.tree.map(lambda x: np.asarray(x, np.float64), p)
    for i in range(3):
        p, o, _ = jstep(p, o, _batch(i), jax.random.PRNGKey(i))
        ema = ema_fn(ema, p)
        manual = jax.tree.map(
            lambda e, x: e * 0.9 + np.asarray(x, np.float64) * 0.1, manual, p
        )
    for a, b in zip(jax.tree.leaves(ema), jax.tree.leaves(manual)):
        np.testing.assert_allclose(np.asarray(a), b, atol=1e-6)

    path = str(tmp_path / "ck.npz")
    save_train_state(path, 3, p, o, ema=ema)
    # restoring without ema_like must refuse (silent EMA loss)
    with pytest.raises(ValueError, match="EMA"):
        load_train_state(path, p, o)
    s, _, _, ema2 = load_train_state(path, p, o, ema_like=ema)
    for a, b in zip(jax.tree.leaves(ema2), jax.tree.leaves(ema)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_latest_and_prune(tmp_path):
    d = str(tmp_path)
    tree = {"w": jnp.ones((2,))}
    for s in (100, 300, 200):
        save_train_state(checkpoint_path(d, s), s, tree, ())
    assert latest_checkpoint(d).endswith("step_00000300.npz")
    prune_checkpoints(d, keep=2)
    names = sorted(os.listdir(d))
    assert names == ["step_00000200.npz", "step_00000300.npz"]
    assert latest_checkpoint(str(tmp_path / "missing")) is None


def test_dataset_prefetch_and_resume_order(tmp_path):
    rng = np.random.RandomState(3)
    for i in range(5):
        np.savez(
            tmp_path / f"ex{i}.npz",
            latents=rng.randn(2, 4, 4, 4).astype(np.float32),
            encoder_hidden_states=rng.randn(3, 6).astype(np.float32),
        )
    ds = LatentDataset(str(tmp_path))
    assert len(ds) == 5

    full = list(ds.batches(2, steps=6, seed=11))
    resumed = list(ds.batches(2, steps=6, seed=11, start=4))
    assert len(full) == 6 and len(resumed) == 2
    for a, b in zip(full[4:], resumed):
        for k in a:
            np.testing.assert_array_equal(a[k], b[k])

    fetched = list(prefetch(ds.batches(2, steps=6, seed=11), depth=2))
    assert len(fetched) == 6
    for a, b in zip(full, fetched):
        for k in a:
            np.testing.assert_array_equal(a[k], np.asarray(b[k]))
            assert isinstance(b[k], jax.Array)

    def boom():
        yield {"latents": np.zeros((1,), np.float32)}
        raise RuntimeError("reader died")

    it = prefetch(boom(), depth=1)
    next(it)
    with pytest.raises(RuntimeError, match="reader died"):
        list(it)


def test_train_cli_checkpoint_resume_e2e(tmp_path):
    """Straight 4-step CLI run == 4-step run interrupted at step 2 + resume:
    identical exported adapters (synthetic data, fixed seeds)."""
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import make_tiny_checkpoint

    root = tmp_path / "CogVideoX-tiny"
    make_tiny_checkpoint.build(str(root))
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
video:
  fps: 8
"""
    )
    env = dict(os.environ, JAX_COMPILATION_CACHE_DIR="/root/.cache/jax_tpu_cache")
    base = [
        sys.executable, "-m", "alg_tpu.train_cli", "--config", str(cfg_path),
        "--synthetic", "4", "--batch_size", "2", "--rank", "2", "--lr", "1e-3",
        "--log_every", "1", "--ema_decay", "0.9",
    ]
    cwd = os.path.join(os.path.dirname(__file__), "..")

    out_a = tmp_path / "straight.npz"
    proc = subprocess.run(
        base + ["--steps", "4", "--output", str(out_a)],
        cwd=cwd, capture_output=True, text=True, env=env, timeout=1200,
    )
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]

    ckdir = tmp_path / "ck"
    out_b = tmp_path / "resumed.npz"
    proc = subprocess.run(
        base + ["--steps", "2", "--checkpoint_dir", str(ckdir), "--save_every", "2",
                "--output", str(tmp_path / "partial.npz")],
        cwd=cwd, capture_output=True, text=True, env=env, timeout=1200,
    )
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    assert latest_checkpoint(str(ckdir)) is not None
    proc = subprocess.run(
        base + ["--steps", "4", "--checkpoint_dir", str(ckdir), "--resume",
                "--output", str(out_b)],
        cwd=cwd, capture_output=True, text=True, env=env, timeout=1200,
    )
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    assert "Resumed from" in proc.stdout

    a, b = dict(np.load(out_a)), dict(np.load(out_b))
    assert sorted(a) == sorted(b)
    for k in a:
        np.testing.assert_array_equal(a[k], b[k])


def test_train_cli_val_loss_and_profile(tmp_path):
    """--val_frac holds out examples and logs val_loss; --profile_dir writes
    a jax.profiler trace."""
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import make_tiny_checkpoint

    root = tmp_path / "CogVideoX-tiny"
    make_tiny_checkpoint.build(str(root))
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
video:
  fps: 8
"""
    )
    env = dict(os.environ, JAX_COMPILATION_CACHE_DIR="/root/.cache/jax_tpu_cache")
    prof = tmp_path / "prof"
    proc = subprocess.run(
        [sys.executable, "-m", "alg_tpu.train_cli", "--config", str(cfg_path),
         "--synthetic", "6", "--steps", "4", "--batch_size", "2", "--rank", "2",
         "--lr", "1e-3", "--log_every", "2", "--val_frac", "0.34",
         "--eval_every", "2", "--profile_dir", str(prof),
         "--output", str(tmp_path / "a.npz")],
        cwd=os.path.join(os.path.dirname(__file__), ".."),
        capture_output=True, text=True, env=env, timeout=1200,
    )
    assert proc.returncode == 0, proc.stdout[-3000:] + proc.stderr[-3000:]
    assert "Validation: 2 examples" in proc.stdout
    assert proc.stdout.count("val_loss") >= 2
    assert prof.is_dir() and any(prof.rglob("*"))  # trace written
