from .mesh import make_mesh, maybe_shard_batch, shard_batch, replicate
from .tp import shard_params_tp, shard_predictor_tp, tp_param_specs
from .fsdp import fsdp_param_specs, shard_params_fsdp, shard_predictor_fsdp
from .distributed import (
    global_batch_from_local, global_batch_from_replicated,
    initialize as initialize_distributed, process_local_slice)

__all__ = ["make_mesh", "maybe_shard_batch", "shard_batch", "replicate",
           "shard_params_tp", "shard_predictor_tp", "tp_param_specs",
           "fsdp_param_specs", "shard_params_fsdp", "shard_predictor_fsdp",
           "global_batch_from_local", "global_batch_from_replicated",
           "initialize_distributed", "process_local_slice"]
