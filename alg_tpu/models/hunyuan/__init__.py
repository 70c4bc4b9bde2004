from alg_tpu.models.hunyuan.transformer import (
    HunyuanVideoTransformerConfig,
    init_hunyuan_transformer,
    hunyuan_transformer,
    hunyuan_rope,
)
from alg_tpu.models.hunyuan.vae import (
    HunyuanVAEConfig,
    init_hunyuan_vae,
    hunyuan_vae_encode,
    hunyuan_vae_decode,
)

__all__ = [
    "HunyuanVideoTransformerConfig",
    "init_hunyuan_transformer",
    "hunyuan_transformer",
    "hunyuan_rope",
    "HunyuanVAEConfig",
    "init_hunyuan_vae",
    "hunyuan_vae_encode",
    "hunyuan_vae_decode",
]
