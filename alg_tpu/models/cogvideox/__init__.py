from alg_tpu.models.cogvideox.transformer import (
    CogVideoXTransformerConfig,
    init_cogvideox_transformer,
    cogvideox_transformer,
    cogvideox_rope,
)
from alg_tpu.models.cogvideox.vae import (
    CogVideoXVAEConfig,
    init_cogvideox_vae,
    cogvideox_vae_encode,
    cogvideox_vae_decode,
)

__all__ = [
    "CogVideoXTransformerConfig",
    "init_cogvideox_transformer",
    "cogvideox_transformer",
    "cogvideox_rope",
    "CogVideoXVAEConfig",
    "init_cogvideox_vae",
    "cogvideox_vae_encode",
    "cogvideox_vae_decode",
]
