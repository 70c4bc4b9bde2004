"""LoRA fine-tuning: trainable low-rank adapters over frozen base params.

Complements :mod:`alg_tpu.io.lora` (which MERGES externally-trained
diffusers/peft adapters for inference): here the adapters are the training
variables. ``W_eff = W + (α/r)·A@B`` with ``A ~ N(0, 1/r)`` and ``B = 0``
(peft init — the adapted model starts exactly at the base model), gradients
flow only through A/B, and the frozen base tree is a closure constant —
optimizer state is O(rank), not O(params).

Adapters address target linears generically by param-tree path: any ``dict``
node holding a ``"kernel"`` whose name is in ``targets``. Weight-stacked
scan blocks (kernels ``[L, in, out]``) get stacked adapters ``A [L, in, r]``
/ ``B [L, r, out]`` — one independent adapter per layer, matching what
peft's per-layer modules produce, and ``jnp.matmul`` batches the leading
axis for free.

Trained adapters export to the peft layout that :mod:`alg_tpu.io.lora`
consumes (``to_peft_state``), so an adapter trained here can be merged into
any pipeline via the existing ``merge_lora_*`` entry points — round-trip
tested.
"""

from __future__ import annotations

from typing import Callable, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp

# attention/MLP projections across all three DiT families (partition.py names)
DEFAULT_TARGETS: Tuple[str, ...] = (
    "to_q", "to_k", "to_v", "to_out",
    "add_q_proj", "add_k_proj", "add_v_proj", "to_add_out",
    "fc_in", "fc_out", "proj_mlp", "proj_out",
)


_KERNEL_LEAVES = ("kernel", "kernel_q", "kernel_q4")


def _target_kernels(params, targets: Sequence[str], prefixes=None):
    """[(path_keys, leaf_name, kernel_leaf)] for every targeted linear in the
    tree — bf16 ("kernel") and quantized ("kernel_q" W8A8 / "kernel_q4" W4A8)
    bases both qualify, so adapters can train over a frozen quantized base."""
    out = []
    for path, leaf in jax.tree_util.tree_leaves_with_path(params):
        keys = tuple(str(getattr(p, "key", p)) for p in path)
        if len(keys) >= 2 and keys[-1] in _KERNEL_LEAVES and keys[-2] in targets:
            if prefixes is not None and keys[0] not in prefixes:
                continue
            out.append((keys[:-1], keys[-1], leaf))
    return out


def init_lora_params(
    key,
    params,
    rank: int = 8,
    targets: Sequence[str] = DEFAULT_TARGETS,
    prefixes: Sequence[str] = None,
) -> Dict[str, Dict[str, jnp.ndarray]]:
    """``{"path/to/module": {"A": [..., in, r], "B": [..., r, out]}}``.

    ``prefixes`` restricts adaptation to subtrees by first path key — e.g.
    ``("blocks",)`` adapts the DiT block stack but not the output head or
    (Hunyuan) the token-refiner, whose linears share target names.
    """
    loras = {}
    for i, (mod_path, leaf_name, w) in enumerate(_target_kernels(params, targets, prefixes)):
        lead, kin, kout = w.shape[:-2], w.shape[-2], w.shape[-1]
        if leaf_name == "kernel_q4":
            kin *= 2  # W4A8 packs two int4 codes per stored IN row
        a = jax.random.normal(
            jax.random.fold_in(key, i), lead + (kin, rank), jnp.float32
        ) * (1.0 / rank)
        b = jnp.zeros(lead + (rank, kout), jnp.float32)
        loras["/".join(mod_path)] = {"A": a, "B": b}
    if not loras:
        raise ValueError(f"no kernels matched targets {tuple(targets)}")
    return loras


def apply_lora(params, loras, scale: float = 1.0):
    """Return a param tree with ``W + scale·A@B`` at every adapted kernel.

    Differentiable in ``loras`` (the path LoRA training takes); the base
    stays untouched. ``scale`` is ``α/r`` in peft terms. The delta is
    computed in fp32 and cast to the kernel dtype.
    """

    def rec(node, prefix):
        if isinstance(node, dict):
            out = {k: rec(v, prefix + (k,)) for k, v in node.items()}
            lp = loras.get("/".join(prefix)) if "kernel" in out else None
            if lp is not None:
                delta = jnp.matmul(lp["A"], lp["B"]) * scale
                out["kernel"] = out["kernel"] + delta.astype(out["kernel"].dtype)
            return out
        return node

    return rec(params, ())


def attach_lora(params, loras, scale: float = 1.0):
    """Return a param tree with UNMERGED adapters attached: each adapted
    module dict gains ``lora_A`` / ``lora_B·scale`` leaves, which
    :func:`alg_tpu.models.layers.linear` reads as ``y += (x·A)·B``.

    Mathematically identical to :func:`apply_lora` (``x·(W + A·B·s) =
    x·W + (x·A)·(B·s)``) but the base kernels are untouched — this is the
    QLoRA path for W8A8/W4A8 bases, where merging would have to materialize
    a bf16 copy of the int8/int4 weights. Works for bf16 bases too.
    """

    def rec(node, prefix):
        if isinstance(node, dict):
            out = {k: rec(v, prefix + (k,)) for k, v in node.items()}
            has_kernel = any(k in out for k in _KERNEL_LEAVES)
            lp = loras.get("/".join(prefix)) if has_kernel else None
            if lp is not None:
                out["lora_A"] = lp["A"]
                out["lora_B"] = lp["B"] * scale
            return out
        return node

    return rec(params, ())


def has_quantized_kernels(params) -> bool:
    """True when the tree holds W8A8/W4A8 kernels (ops.quant layouts)."""
    for path, _ in jax.tree_util.tree_leaves_with_path(params):
        keys = tuple(str(getattr(p, "key", p)) for p in path)
        if keys and keys[-1] in ("kernel_q", "kernel_q4"):
            return True
    return False


def make_lora_loss(
    loss_fn: Callable, base_params=None, scale: float = 1.0, attach: bool = None
) -> Callable:
    """``loss(loras, batch, key)`` — the full-params loss over a frozen base,
    with the LoRA tree as the trainable params; feed to
    :func:`alg_tpu.training.make_train_step`.

    With ``base_params`` given, the base is frozen in the closure (fine for
    tests/small trees). With ``base_params=None`` the returned loss takes the
    base as a trailing CALL argument — ``loss(loras, batch, key, base)`` —
    which is how the train CLI runs it: a closure-captured 9-30 GB tree gets
    serialized into the lowered program as constants (minutes of host time,
    a second HBM copy — fatal at 13-14B scale), while a jit argument reuses
    the live device buffers. ``make_train_step`` passes such trailing args
    through: ``step(loras, opt_state, batch, key, base)``.

    ``attach`` selects merged (:func:`apply_lora`, False) vs attached
    (:func:`attach_lora`, True) application; the default (None) attaches
    exactly when the base is quantized — QLoRA — since merging into an
    int8/int4 base is impossible without materializing bf16 weights.
    ``attach`` must be set explicitly when ``base_params`` is None.
    """
    if attach is None:
        if base_params is None:
            raise ValueError("attach must be given when the base is a call argument")
        attach = has_quantized_kernels(base_params)
    bind = attach_lora if attach else apply_lora

    if base_params is None:

        def lora_loss(loras, batch, key, base):
            return loss_fn(bind(base, loras, scale), batch, key)

    else:

        def lora_loss(loras, batch, key):
            return loss_fn(bind(base_params, loras, scale), batch, key)

    return lora_loss


def to_peft_state(
    loras: Dict[str, Dict[str, jnp.ndarray]],
    block_paths: Dict[str, str],
    prefix: str = "transformer.",
):
    """Export trained adapters to the peft state-dict layout that
    :func:`alg_tpu.io.lora.collect_lora_pairs` parses.

    ``block_paths`` maps the stacked-tree module path (e.g.
    ``"blocks/attn/to_q"``) to the diffusers module-name TEMPLATE with ``{i}``
    for the layer index (e.g. ``"transformer_blocks.{i}.attn1.to_q"``).
    Stacked adapters ``[L, in, r]`` expand to per-layer entries. peft stores
    ``lora_A.weight [r, in]`` / ``lora_B.weight [out, r]`` (torch [out, in]
    convention) — transposed from our [in, r]/[r, out].
    """
    import numpy as np

    state = {}
    for path, ab in loras.items():
        template = block_paths.get(path)
        if template is None:
            raise KeyError(f"no diffusers module template for adapter {path!r}")
        a, b = np.asarray(ab["A"]), np.asarray(ab["B"])
        if a.ndim == 3:
            for i in range(a.shape[0]):
                name = prefix + template.format(i=i)
                state[f"{name}.lora_A.weight"] = a[i].T
                state[f"{name}.lora_B.weight"] = b[i].T
        else:
            name = prefix + template.format(i=0)
            state[f"{name}.lora_A.weight"] = a.T
            state[f"{name}.lora_B.weight"] = b.T
    return state


# stacked-tree path → diffusers module template, per family (inverse of the
# io/lora.py block maps, restricted to the linears LoRA typically adapts)
COGVIDEOX_PEFT_PATHS = {
    "blocks/attn/to_q": "transformer_blocks.{i}.attn1.to_q",
    "blocks/attn/to_k": "transformer_blocks.{i}.attn1.to_k",
    "blocks/attn/to_v": "transformer_blocks.{i}.attn1.to_v",
    "blocks/attn/to_out": "transformer_blocks.{i}.attn1.to_out.0",
    "blocks/ff/fc_in": "transformer_blocks.{i}.ff.net.0.proj",
    "blocks/ff/fc_out": "transformer_blocks.{i}.ff.net.2",
}

WAN_PEFT_PATHS = {
    "blocks/attn1/to_q": "blocks.{i}.attn1.to_q",
    "blocks/attn1/to_k": "blocks.{i}.attn1.to_k",
    "blocks/attn1/to_v": "blocks.{i}.attn1.to_v",
    "blocks/attn1/to_out": "blocks.{i}.attn1.to_out.0",
    "blocks/attn2/to_q": "blocks.{i}.attn2.to_q",
    "blocks/attn2/to_k": "blocks.{i}.attn2.to_k",
    "blocks/attn2/to_v": "blocks.{i}.attn2.to_v",
    "blocks/attn2/to_out": "blocks.{i}.attn2.to_out.0",
    "blocks/attn2/add_k_proj": "blocks.{i}.attn2.add_k_proj",
    "blocks/attn2/add_v_proj": "blocks.{i}.attn2.add_v_proj",
    "blocks/ffn/fc_in": "blocks.{i}.ffn.net.0.proj",
    "blocks/ffn/fc_out": "blocks.{i}.ffn.net.2",
}

HUNYUAN_PEFT_PATHS = {
    "transformer_blocks/attn/to_q": "transformer_blocks.{i}.attn.to_q",
    "transformer_blocks/attn/to_k": "transformer_blocks.{i}.attn.to_k",
    "transformer_blocks/attn/to_v": "transformer_blocks.{i}.attn.to_v",
    "transformer_blocks/attn/to_out": "transformer_blocks.{i}.attn.to_out.0",
    "transformer_blocks/attn/add_q_proj": "transformer_blocks.{i}.attn.add_q_proj",
    "transformer_blocks/attn/add_k_proj": "transformer_blocks.{i}.attn.add_k_proj",
    "transformer_blocks/attn/add_v_proj": "transformer_blocks.{i}.attn.add_v_proj",
    "transformer_blocks/attn/to_add_out": "transformer_blocks.{i}.attn.to_add_out",
    "transformer_blocks/ff/fc_in": "transformer_blocks.{i}.ff.net.0.proj",
    "transformer_blocks/ff/fc_out": "transformer_blocks.{i}.ff.net.2",
    "transformer_blocks/ff_context/fc_in": "transformer_blocks.{i}.ff_context.net.0.proj",
    "transformer_blocks/ff_context/fc_out": "transformer_blocks.{i}.ff_context.net.2",
    "single_transformer_blocks/attn/to_q": "single_transformer_blocks.{i}.attn.to_q",
    "single_transformer_blocks/attn/to_k": "single_transformer_blocks.{i}.attn.to_k",
    "single_transformer_blocks/attn/to_v": "single_transformer_blocks.{i}.attn.to_v",
    "single_transformer_blocks/proj_mlp": "single_transformer_blocks.{i}.proj_mlp",
    "single_transformer_blocks/proj_out": "single_transformer_blocks.{i}.proj_out",
}

# adapter scope per family: (path prefixes, diffusers templates)
FAMILY_PEFT = {
    "cogvideox": (("blocks",), COGVIDEOX_PEFT_PATHS),
    "wan": (("blocks",), WAN_PEFT_PATHS),
    "hunyuan": (
        ("transformer_blocks", "single_transformer_blocks"),
        HUNYUAN_PEFT_PATHS,
    ),
}
