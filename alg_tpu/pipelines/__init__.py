from alg_tpu.pipelines.cogvideox import CogVideoXPipeline
from alg_tpu.pipelines.wan import WanPipeline
from alg_tpu.pipelines.hunyuan import HunyuanVideoPipeline

__all__ = ["CogVideoXPipeline", "WanPipeline", "HunyuanVideoPipeline"]
