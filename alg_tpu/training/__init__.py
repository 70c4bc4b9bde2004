"""Training tier (beyond-parity: the reference is inference-only, SURVEY §0).

Losses in the pipelines' exact model-input layouts, an optax train step with
remat + gradient accumulation + mesh sharding (reusing the inference TP
partition specs), and LoRA fine-tuning whose trained adapters export to the
peft layout ``alg_tpu.io.lora`` merges.
"""

from alg_tpu.training.checkpoint import (
    checkpoint_path,
    init_ema,
    latest_checkpoint,
    load_train_state,
    make_ema_update,
    prune_checkpoints,
    save_train_state,
)
from alg_tpu.training.data import LatentDataset, prefetch
from alg_tpu.training.losses import (
    make_cogvideox_vpred_loss,
    make_hunyuan_flow_loss,
    make_wan_flow_loss,
    sample_flow_sigmas,
    shift_sigmas,
)
from alg_tpu.training.lora import (
    COGVIDEOX_PEFT_PATHS,
    DEFAULT_TARGETS,
    FAMILY_PEFT,
    HUNYUAN_PEFT_PATHS,
    WAN_PEFT_PATHS,
    apply_lora,
    attach_lora,
    init_lora_params,
    has_quantized_kernels,
    make_lora_loss,
    to_peft_state,
)
from alg_tpu.training.train import (
    TrainConfig,
    load_params_npz,
    make_optimizer,
    make_sharded_train_step,
    make_train_step,
    save_params_npz,
    shard_batch,
)

__all__ = [
    "TrainConfig",
    "make_optimizer",
    "make_train_step",
    "make_sharded_train_step",
    "shard_batch",
    "save_params_npz",
    "load_params_npz",
    "make_cogvideox_vpred_loss",
    "make_wan_flow_loss",
    "make_hunyuan_flow_loss",
    "sample_flow_sigmas",
    "shift_sigmas",
    "init_lora_params",
    "apply_lora",
    "attach_lora",
    "has_quantized_kernels",
    "make_lora_loss",
    "to_peft_state",
    "DEFAULT_TARGETS",
    "COGVIDEOX_PEFT_PATHS",
    "WAN_PEFT_PATHS",
    "HUNYUAN_PEFT_PATHS",
    "FAMILY_PEFT",
    "save_train_state",
    "load_train_state",
    "checkpoint_path",
    "latest_checkpoint",
    "prune_checkpoints",
    "init_ema",
    "make_ema_update",
    "LatentDataset",
    "prefetch",
]
