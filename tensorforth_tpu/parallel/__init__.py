from .mesh import make_mesh, shard_batch, shard_params  # noqa: F401
from .trainer import make_train_step, ShardedTrainer     # noqa: F401
