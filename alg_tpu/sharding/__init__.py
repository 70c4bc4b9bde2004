from alg_tpu.sharding.mesh import make_mesh, cpu_mesh
from alg_tpu.sharding.multihost import (
    initialize as multihost_initialize,
    local_mesh,
    local_request_slice,
    serve_batch_multihost,
)
from alg_tpu.sharding.partition import (
    add_pp,
    cogvideox_transformer_specs,
    hunyuan_transformer_specs,
    shard_params,
    wan_transformer_specs,
)
from alg_tpu.sharding.pipeline import pipeline_blocks, run_blocks

__all__ = [
    "add_pp",
    "pipeline_blocks",
    "run_blocks",
    "make_mesh",
    "cpu_mesh",
    "multihost_initialize",
    "local_mesh",
    "local_request_slice",
    "serve_batch_multihost",
    "cogvideox_transformer_specs",
    "wan_transformer_specs",
    "hunyuan_transformer_specs",
    "shard_params",
]
