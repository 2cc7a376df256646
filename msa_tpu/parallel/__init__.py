from .mesh import make_mesh, batch_sharding, replicated, DATA_AXIS, MODEL_AXIS  # noqa: F401
from .sharding import param_specs, param_shardings, shard_params  # noqa: F401
