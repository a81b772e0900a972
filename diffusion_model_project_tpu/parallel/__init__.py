from .mesh import make_mesh, shard_batch, replicate
from .tp import shard_params_tp, shard_predictor_tp, tp_param_specs

__all__ = ["make_mesh", "shard_batch", "replicate",
           "shard_params_tp", "shard_predictor_tp", "tp_param_specs"]
