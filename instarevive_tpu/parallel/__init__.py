from instarevive_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    param_sharding_rules,
    shard_batch,
    shard_params,
)
from instarevive_tpu.parallel.tp import (  # noqa: F401
    shard_params_tp,
    tp_shardings,
)
