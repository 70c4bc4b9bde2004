from alg_tpu.models.wan.transformer import (
    WanTransformerConfig,
    init_wan_transformer,
    wan_transformer,
    wan_rope,
)
from alg_tpu.models.wan.vae import (
    WanVAEConfig,
    init_wan_vae,
    wan_vae_encode,
    wan_vae_decode,
)

__all__ = [
    "WanTransformerConfig",
    "init_wan_transformer",
    "wan_transformer",
    "wan_rope",
    "WanVAEConfig",
    "init_wan_vae",
    "wan_vae_encode",
    "wan_vae_decode",
]
