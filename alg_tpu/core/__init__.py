from alg_tpu.core.config import RunConfig, load_run_config
from alg_tpu.core.rng import torch_randn, torch_randn_like, NoiseSource

__all__ = ["RunConfig", "load_run_config", "torch_randn", "torch_randn_like", "NoiseSource"]
