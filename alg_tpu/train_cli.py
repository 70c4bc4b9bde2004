"""Fine-tuning CLI — ``alg-tpu-train`` (beyond-parity; reference is
inference-only, SURVEY §0/§5).

LoRA (default) or full fine-tuning of any of the three DiT families on
precomputed **latent batches**: the standard video fine-tune recipe keeps
the VAE and text encoders frozen, so training data is a directory of
``.npz`` files, one example each, with the loss's batch keys (see
``alg_tpu/training/losses.py``):

* cogvideox: ``latents [F,C,H,W]``, ``image_latents [F,C,H,W]``,
  ``encoder_hidden_states [S,text_dim]``
* wan: ``latents [C,F,h,w]``, ``condition [20,F,h,w]``,
  ``encoder_hidden_states [S,text_dim]``
  (+ optional ``encoder_hidden_states_image``)
* hunyuan: ``latents [C,F,h,w]``, ``image_latents [C,1,h,w]``,
  ``encoder_hidden_states [S,text_dim]``, ``encoder_attention_mask [S]``,
  ``pooled_projections [P]``

``--synthetic N`` generates N random examples shaped by the model config
and the YAML's ``generation`` section instead — a smoke path for CI and for
validating a run configuration before committing real data.

LoRA adapters are saved as a **peft-layout** ``.npz`` that the inference
LoRA loader (``alg_tpu.io.lora.merge_lora_*`` / the pipelines' ``lora``
hook) merges directly; full fine-tunes save a path-keyed param-tree ``.npz``
(``alg_tpu.training.train.load_params_npz``). Model loading reuses the
serving CLI's family dispatch (``alg_tpu.cli.load_pipeline``), so the same
YAML config drives generation, serving, and fine-tuning.
"""

from __future__ import annotations

import argparse
import logging
import sys
import time

import numpy as np

logging.basicConfig(level=logging.INFO, format="%(asctime)s - %(levelname)s - %(message)s", stream=sys.stdout)
logger = logging.getLogger(__name__)


def _latent_geometry(family: str, example: dict):
    """(latent_frames, latent_h, latent_w) from one example."""
    lat = example["latents"]
    if family == "cogvideox":  # [F, C, H, W]
        return lat.shape[0], lat.shape[2], lat.shape[3]
    return lat.shape[1], lat.shape[2], lat.shape[3]  # [C, F, h, w]


def build_loss(pipe, family: str, args, geom):
    """Family loss closed over rope tables for the data's latent geometry."""
    import jax.numpy as jnp

    from alg_tpu.training import (
        make_cogvideox_vpred_loss,
        make_hunyuan_flow_loss,
        make_wan_flow_loss,
    )

    cd = jnp.bfloat16 if args.compute_dtype == "bfloat16" else None
    tcfg = pipe.transformer_cfg
    f, h, w = geom
    if family == "cogvideox":
        cos = sin = None
        if tcfg.use_rotary_positional_embeddings:
            from alg_tpu.models.cogvideox import cogvideox_rope

            cos, sin = cogvideox_rope(tcfg, h * 8, w * 8, f)
        return make_cogvideox_vpred_loss(tcfg, rope_cos=cos, rope_sin=sin, compute_dtype=cd)
    if family == "wan":
        from alg_tpu.models.wan import wan_rope

        cos, sin = wan_rope(tcfg, f, h, w)
        return make_wan_flow_loss(
            tcfg, shift=args.shift if args.shift is not None else 5.0,
            rope_cos=cos, rope_sin=sin, compute_dtype=cd,
        )
    if family == "hunyuan":
        from alg_tpu.models.hunyuan import hunyuan_rope

        cos, sin = hunyuan_rope(tcfg, f, h, w)
        g = pipe_guidance_scale(args)
        return make_hunyuan_flow_loss(
            tcfg, shift=args.shift if args.shift is not None else 7.0,
            guidance_scale=g, rope_cos=cos, rope_sin=sin, compute_dtype=cd,
        )
    raise ValueError(family)  # pragma: no cover


def pipe_guidance_scale(args) -> float:
    g = args.cfg_generation.get("guidance_scale")
    return float(g) if g is not None else 6.0


def synth_examples(family: str, pipe, n: int, gen: dict, seed: int):
    """Random latent-space examples shaped by the model config + generation
    section (VAE 8x spatial / 4x temporal factors, all three families)."""
    tcfg = pipe.transformer_cfg
    height = int(gen.get("height") or 32)
    width = int(gen.get("width") or 32)
    frames = int(gen.get("num_frames") or 5)
    max_seq = int(gen.get("max_sequence_length") or 16)
    f, h, w = (frames - 1) // 4 + 1, height // 8, width // 8
    rng = np.random.RandomState(seed)
    out = []
    for _ in range(n):
        if family == "cogvideox":
            c = tcfg.out_channels
            out.append({
                "latents": rng.randn(f, c, h, w).astype(np.float32),
                "image_latents": rng.randn(f, tcfg.in_channels - c, h, w).astype(np.float32),
                "encoder_hidden_states": rng.randn(max_seq, tcfg.text_embed_dim).astype(np.float32),
            })
        elif family == "wan":
            c = tcfg.out_channels
            ex = {
                "latents": rng.randn(c, f, h, w).astype(np.float32),
                "condition": rng.randn(tcfg.in_channels - c, f, h, w).astype(np.float32),
                "encoder_hidden_states": rng.randn(max_seq, tcfg.text_dim).astype(np.float32),
            }
            if tcfg.image_dim is not None:
                ex["encoder_hidden_states_image"] = rng.randn(5, tcfg.image_dim).astype(np.float32)
            out.append(ex)
        elif family == "hunyuan":
            c = tcfg.out_channels
            out.append({
                "latents": rng.randn(c, f, h, w).astype(np.float32),
                "image_latents": rng.randn(c, 1, h, w).astype(np.float32),
                "encoder_hidden_states": rng.randn(max_seq, tcfg.text_embed_dim).astype(np.float32),
                "encoder_attention_mask": np.ones(max_seq, np.int32),
                "pooled_projections": rng.randn(tcfg.pooled_projection_dim).astype(np.float32),
            })
        else:  # pragma: no cover
            raise ValueError(family)
    return out


def random_init_pipeline(family: str, cfg, quantize: str):
    """Full-size random-init pipeline (the ``bench.py`` approach): proves a
    training configuration on real hardware without network egress — the FLOP
    graph and memory profile are identical to real weights. Weights generate
    (and with ``--quantize``, quantize) ON the device with bounded temp
    memory (``device_init_params``/``device_init_quantized_params``), so a
    13-14B tree is ready in ~1-2 min instead of the ~15-20 min host-init +
    tunnel-streaming route — and the device still never holds the bf16
    originals of a quantized base (the only way 13-14B QLoRA fits one v5e
    chip)."""
    import jax
    import jax.numpy as jnp

    from alg_tpu.core.device import device_init_params
    from alg_tpu.ops.quant import device_init_quantized_params

    dtype = cfg.model_dtype

    def mk(init_fn, modulation=False):
        if quantize != "none":
            return device_init_quantized_params(init_fn, mode=quantize, modulation=modulation)
        return device_init_params(init_fn)

    if family == "cogvideox":
        from alg_tpu.models.cogvideox import (
            CogVideoXTransformerConfig,
            CogVideoXVAEConfig,
            init_cogvideox_transformer,
        )
        from alg_tpu.pipelines import CogVideoXPipeline

        tcfg = CogVideoXTransformerConfig()
        params = mk(lambda: init_cogvideox_transformer(jax.random.PRNGKey(0), tcfg, dtype=dtype))
        return CogVideoXPipeline(
            transformer_cfg=tcfg, transformer_params=params,
            vae_cfg=CogVideoXVAEConfig(), vae_params=None,
            scheduler="ddim", dtype=dtype,
        )
    if family == "wan":
        from alg_tpu.models.wan import WanTransformerConfig, WanVAEConfig, init_wan_transformer
        from alg_tpu.pipelines import WanPipeline
        from alg_tpu.schedulers import UniPCConfig

        tcfg = WanTransformerConfig()
        params = mk(lambda: init_wan_transformer(jax.random.PRNGKey(0), tcfg, dtype=dtype))
        return WanPipeline(
            transformer_cfg=tcfg, transformer_params=params,
            vae_cfg=WanVAEConfig(), vae_params=None,
            scheduler_cfg=UniPCConfig(flow_shift=5.0), dtype=dtype,
        )
    if family == "hunyuan":
        from alg_tpu.models.hunyuan import (
            HunyuanVAEConfig,
            HunyuanVideoTransformerConfig,
            init_hunyuan_transformer,
        )
        from alg_tpu.pipelines import HunyuanVideoPipeline
        from alg_tpu.schedulers import FlowMatchEulerConfig

        tcfg = HunyuanVideoTransformerConfig()
        # modulation=True matches the Hunyuan serving config (docs/PERF.md):
        # the 6.5 GiB bf16 AdaLN stacks must quantize for the 13B base +
        # adapters + optimizer to fit one chip — and the stacked quantized
        # init path is also ~10x faster over the tunnel than leaf-by-leaf
        # bf16 generation of those stacks
        params = mk(
            lambda: init_hunyuan_transformer(jax.random.PRNGKey(0), tcfg, dtype=dtype),
            modulation=quantize != "none",
        )
        return HunyuanVideoPipeline(
            transformer_cfg=tcfg, transformer_params=params,
            vae_cfg=HunyuanVAEConfig(), vae_params=None,
            scheduler_cfg=FlowMatchEulerConfig(shift=7.0, invert_sigmas=False),
            dtype=dtype,
        )
    raise ValueError(family)  # pragma: no cover


def batches(examples, batch_size: int, steps: int, seed: int, start: int = 0):
    """Shuffled epochs over in-memory examples (synthetic mode), stacked into
    host batches; ``start`` skips batches without materializing them (resume
    keeps the data order bit-exact)."""
    rng = np.random.RandomState(seed)
    order: list = []
    for step in range(steps):
        while len(order) < batch_size:
            epoch = list(range(len(examples)))
            rng.shuffle(epoch)
            order.extend(epoch)
        idx, order = order[:batch_size], order[batch_size:]
        if step < start:
            continue
        keys = examples[0].keys()
        yield {k: np.stack([examples[i][k] for i in idx]) for k in keys}


def main(argv=None):
    parser = argparse.ArgumentParser(description="alg-tpu fine-tuning (LoRA or full)")
    parser.add_argument("--config", type=str, required=True, help="run.py-style YAML (model/generation sections)")
    parser.add_argument("--model_cache_dir", type=str, default=None)
    parser.add_argument("--data", type=str, default=None, help="directory of per-example .npz files")
    parser.add_argument("--synthetic", type=int, default=0, help="train on N random examples instead of --data")
    parser.add_argument("--random_init", action="store_true",
                        help="full-size random-init weights instead of loading the checkpoint "
                             "(hardware/memory/throughput validation of a run config; with "
                             "--quantize the base streams pre-quantized, never bf16)")
    parser.add_argument("--mode", choices=("lora", "full"), default="lora")
    parser.add_argument("--quantize", choices=("none", "w8", "w4"), default="none",
                        help="QLoRA: freeze the base DiT as W8A8/W4A8 (ops.quant) and train "
                        "bf16 adapters over it — the HBM lever for 13-14B fine-tuning on one "
                        "chip; --mode lora only")
    parser.add_argument("--rank", type=int, default=16, help="LoRA rank")
    parser.add_argument("--lora_scale", type=float, default=1.0, help="alpha/rank scale applied at merge")
    parser.add_argument("--lr", type=float, default=1e-4)
    parser.add_argument("--weight_decay", type=float, default=0.0)
    parser.add_argument("--grad_clip", type=float, default=1.0)
    parser.add_argument("--steps", type=int, default=100)
    parser.add_argument("--batch_size", type=int, default=1)
    parser.add_argument("--accum", type=int, default=1, help="gradient accumulation micro-steps")
    parser.add_argument("--remat", action="store_true", help="checkpoint DiT blocks (O(1)-in-depth memory)")
    parser.add_argument("--compute_dtype", choices=("float32", "bfloat16"), default="float32")
    parser.add_argument("--shift", type=float, default=None, help="flow-matching timestep shift (default: family)")
    parser.add_argument("--dp", type=int, default=1, help="data-parallel mesh axis (full mode)")
    parser.add_argument("--tp", type=int, default=1, help="tensor-parallel mesh axis (full mode)")
    parser.add_argument("--pp", type=int, default=1, help="pipeline-parallel stages over DiT layers (full mode)")
    parser.add_argument("--pp_micro", type=int, default=None, help="GPipe microbatches (default: --pp)")
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--log_every", type=int, default=10)
    parser.add_argument("--output", type=str, required=True, help=".npz output (peft adapters | param tree)")
    parser.add_argument("--checkpoint_dir", type=str, default=None, help="save/resume training state here")
    parser.add_argument("--save_every", type=int, default=500, help="checkpoint interval (steps)")
    parser.add_argument("--keep", type=int, default=3, help="checkpoints retained (0 = all)")
    parser.add_argument("--resume", action="store_true", help="resume from the latest checkpoint in --checkpoint_dir")
    parser.add_argument("--ema_decay", type=float, default=0.0, help="EMA shadow decay (e.g. 0.999); exported instead of raw weights when set")
    parser.add_argument("--prefetch", type=int, default=2, help="host-side batch prefetch depth (0 = off)")
    parser.add_argument("--val_frac", type=float, default=0.0, help="hold out this fraction of examples for validation")
    parser.add_argument("--eval_every", type=int, default=50, help="validation-loss interval (with --val_frac)")
    parser.add_argument("--profile_dir", type=str, default=None, help="jax.profiler trace of steps 2-4 (view with TensorBoard/xprof)")
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from alg_tpu.cli import load_pipeline
    from alg_tpu.core.config import load_run_config
    from alg_tpu.core.device import enable_compilation_cache
    from alg_tpu.training import (
        FAMILY_PEFT,
        TrainConfig,
        init_lora_params,
        make_lora_loss,
        make_sharded_train_step,
        make_train_step,
        shard_batch,
        to_peft_state,
    )
    from alg_tpu.training.train import save_params_npz

    enable_compilation_cache()
    cfg = load_run_config(args.config)
    args.cfg_generation = cfg.generation
    family = cfg.family
    if args.random_init:
        pipe = random_init_pipeline(family, cfg, args.quantize)
        logger.info("Random-init %s pipeline (full-size%s) for fine-tuning (%s mode)",
                    family, f", device-quantized {args.quantize}" if args.quantize != "none" else "",
                    args.mode)
    else:
        pipe = load_pipeline(cfg, args.model_cache_dir)
        logger.info("Loaded %s pipeline for fine-tuning (%s mode)", family, args.mode)

    from alg_tpu.training.data import LatentDataset, prefetch

    dataset = None
    if args.synthetic:
        examples = synth_examples(family, pipe, args.synthetic, cfg.generation, args.seed)
        first = examples[0]
        logger.info("Synthetic data: %d examples", len(examples))
    elif args.data:
        dataset = LatentDataset(args.data)
        first = dataset.example(0)
        logger.info("Dataset: %d examples from %s", len(dataset), args.data)
    else:
        parser.error("one of --data or --synthetic is required")

    geom = _latent_geometry(family, first)
    loss_fn = build_loss(pipe, family, args, geom)
    tc = TrainConfig(
        learning_rate=args.lr, weight_decay=args.weight_decay, grad_clip=args.grad_clip,
        accum_steps=args.accum, remat=args.remat,
    )

    # --- validation holdout (fixed batches, evaluated with a fixed key)
    val_batches = []
    if args.val_frac > 0:
        if dataset is not None:
            n_val = max(1, int(len(dataset) * args.val_frac))
            val_examples = [dataset.example(i) for i in range(len(dataset) - n_val, len(dataset))]
            dataset.files = dataset.files[: len(dataset) - n_val]
        else:
            n_val = max(1, int(len(examples) * args.val_frac))
            val_examples, examples = examples[-n_val:], examples[:-n_val]
        while len(val_examples) % args.batch_size:  # cycle to a full batch
            val_examples.append(val_examples[len(val_examples) % n_val])
        keys0 = sorted(val_examples[0].keys())
        for j in range(0, len(val_examples), args.batch_size):
            chunk = val_examples[j : j + args.batch_size]
            val_batches.append({k: np.stack([ex[k] for ex in chunk]) for k in keys0})
        logger.info("Validation: %d examples (%d batches)", n_val, len(val_batches))

    base = pipe.transformer_params
    mesh = None
    if args.quantize != "none":
        if args.mode != "lora":
            parser.error("--quantize requires --mode lora (the quantized base is frozen; train adapters)")
        if not args.random_init:  # --random_init streams the tree pre-quantized
            from alg_tpu.ops.quant import quantize_transformer_params

            base = quantize_transformer_params(base, mode=args.quantize)
        logger.info("QLoRA: base DiT frozen as %s; gradients flow through the "
                    "dequantized-weight custom VJP", args.quantize)
    if args.mode == "lora":
        from alg_tpu.training.lora import has_quantized_kernels

        prefixes, peft_paths = FAMILY_PEFT[family]
        trainable = init_lora_params(
            jax.random.PRNGKey(args.seed), base, rank=args.rank, prefixes=prefixes
        )
        n_adapted = len(trainable)
        # the frozen base is a CALL argument of the jitted step, not a closure
        # constant — captured constants serialize the whole 9-30 GB tree into
        # the lowered program (see make_lora_loss)
        train_loss = make_lora_loss(
            loss_fn, None, scale=args.lora_scale, attach=has_quantized_kernels(base)
        )
        step, opt = make_train_step(train_loss, tc)
        opt_state = opt.init(trainable)
        _jstep = jax.jit(step, donate_argnums=(0, 1))
        jstep = lambda t, o, b, k: _jstep(t, o, b, k, base)
        _jeval_lora = jax.jit(train_loss)
        eval_fn = lambda t, b, k: _jeval_lora(t, b, k, base)
        logger.info("LoRA: rank %d over %d modules", args.rank, n_adapted)
        # HBM accounting for the training record (the axon tunnel exposes no
        # device memory_stats): resident device bytes of the three big trees
        gb = lambda t: sum(
            x.size * x.dtype.itemsize for x in jax.tree.leaves(t) if hasattr(x, "dtype")
        ) / 2**30
        logger.info(
            "Device trees: frozen base %.2f GiB, adapters %.3f GiB, optimizer %.3f GiB",
            gb(base), gb(trainable), gb(opt_state),
        )
    else:
        trainable = base
        if args.dp * args.tp * args.pp > 1:
            from alg_tpu.sharding import make_mesh
            from alg_tpu.sharding.partition import (
                cogvideox_transformer_specs,
                hunyuan_transformer_specs,
                wan_transformer_specs,
            )

            specs = {
                "cogvideox": cogvideox_transformer_specs,
                "wan": wan_transformer_specs,
                "hunyuan": hunyuan_transformer_specs,
            }[family](base)
            mesh = make_mesh(dp=args.dp, sp=1, tp=args.tp, pp=args.pp)
            jstep, trainable, opt_state = make_sharded_train_step(
                loss_fn, tc, mesh, base, specs, pp_micro=args.pp_micro
            )

            _jeval = jax.jit(loss_fn)  # traced on first call (ctx active then)

            def eval_fn(params, batch, key):
                if args.pp > 1:
                    from alg_tpu.sharding.pipeline import pipeline_blocks

                    with pipeline_blocks(mesh, args.pp_micro):
                        return _jeval(params, batch, key)
                return _jeval(params, batch, key)
        else:
            step, opt = make_train_step(loss_fn, tc)
            opt_state = opt.init(trainable)
            jstep = jax.jit(step, donate_argnums=(0, 1))
            eval_fn = jax.jit(loss_fn)

    # --- checkpoint/resume + EMA (training/checkpoint.py)
    from alg_tpu.training.checkpoint import (
        checkpoint_path,
        init_ema,
        latest_checkpoint,
        load_train_state,
        make_ema_update,
        prune_checkpoints,
        save_train_state,
    )

    ema = init_ema(trainable) if args.ema_decay else None
    ema_fn = make_ema_update(args.ema_decay) if args.ema_decay else None
    start_step = 0
    if args.resume:
        if not args.checkpoint_dir:
            parser.error("--resume requires --checkpoint_dir")
        path = latest_checkpoint(args.checkpoint_dir)
        if path is None:
            logger.info("No checkpoint under %s; starting fresh", args.checkpoint_dir)
        else:
            def place_like(tree, like):  # keep the templates' (mesh) placement
                return jax.tree.map(
                    lambda x, l: jax.device_put(x, l.sharding), tree, like
                )

            start_step, r_train, r_opt, r_ema = load_train_state(
                path, trainable, opt_state, ema
            )
            trainable = place_like(r_train, trainable)
            opt_state = place_like(r_opt, opt_state)
            if r_ema is not None:
                ema = place_like(r_ema, ema)
            logger.info("Resumed from %s (step %d)", path, start_step)

    if dataset is not None:
        batch_iter = dataset.batches(args.batch_size, args.steps, args.seed, start=start_step)
    else:
        batch_iter = batches(examples, args.batch_size, args.steps, args.seed, start=start_step)
    if args.prefetch:
        batch_iter = prefetch(batch_iter, depth=args.prefetch, mesh=mesh)

    t0 = time.perf_counter()
    i = start_step - 1
    profiling = False
    for i, batch in enumerate(batch_iter, start=start_step):
        if args.profile_dir and i == start_step + 1:  # skip the compile step
            jax.profiler.start_trace(args.profile_dir)
            profiling = True
            logger.info("Profiling steps %d-%d to %s", i + 1, i + 3, args.profile_dir)
        if mesh is not None and not args.prefetch:
            batch = shard_batch(batch, mesh)
        trainable, opt_state, m = jstep(
            trainable, opt_state, batch, jax.random.fold_in(jax.random.PRNGKey(args.seed), i)
        )
        if ema_fn is not None:
            ema = ema_fn(ema, trainable)
        if profiling and (i == start_step + 3 or i == args.steps - 1):
            float(m["loss"])  # fetch: make the async work land inside the trace
            jax.profiler.stop_trace()
            profiling = False
        if val_batches and ((i + 1) % args.eval_every == 0 or i + 1 == args.steps):
            vals = [
                float(eval_fn(trainable, {k: jnp.asarray(v) for k, v in vb.items()},
                              jax.random.PRNGKey(10_000 + j)))
                for j, vb in enumerate(val_batches)
            ]
            logger.info("step %d/%d  val_loss %.5f", i + 1, args.steps, float(np.mean(vals)))
        if (i - start_step) % args.log_every == 0 or i == args.steps - 1:
            loss = float(m["loss"])  # device fetch — also the axon sync point
            logger.info(
                "step %d/%d  loss %.5f  grad_norm %.4f  (%.2f s/step)",
                i + 1, args.steps, loss, float(m["grad_norm"]),
                (time.perf_counter() - t0) / (i + 1 - start_step),
            )
            if not np.isfinite(loss):
                raise RuntimeError(f"non-finite loss at step {i + 1}")
        if args.checkpoint_dir and ((i + 1) % args.save_every == 0 or i + 1 == args.steps):
            import os

            os.makedirs(args.checkpoint_dir, exist_ok=True)
            save_train_state(
                checkpoint_path(args.checkpoint_dir, i + 1), i + 1, trainable, opt_state, ema
            )
            prune_checkpoints(args.checkpoint_dir, args.keep)
            logger.info("Checkpointed step %d", i + 1)

    export = ema if ema is not None else trainable
    if args.mode == "lora":
        state = to_peft_state(export, FAMILY_PEFT[family][1])
        np.savez(args.output, **state)
        logger.info(
            "Saved %d peft tensors%s to %s (merge via alg_tpu.io.lora)",
            len(state), " (EMA)" if ema is not None else "", args.output,
        )
    else:
        save_params_npz(args.output, export)
        logger.info(
            "Saved fine-tuned%s param tree to %s",
            " EMA" if ema is not None else "", args.output,
        )
    logger.info("Training complete.")


if __name__ == "__main__":
    main()
