from .distributed import (distributed_init, local_batch_to_global, put_global,
                          run_multiprocess_dryrun, shard_params_global)
from .mesh import (DATA_AXIS, MODEL_AXIS, batch_sharding, batch_spec, make_mesh,
                   param_shardings, param_specs, replicate, shard_params)

__all__ = ["DATA_AXIS", "MODEL_AXIS", "make_mesh", "batch_spec", "batch_sharding",
           "param_specs", "param_shardings", "shard_params", "replicate",
           "distributed_init", "put_global", "shard_params_global",
           "local_batch_to_global", "run_multiprocess_dryrun"]
