"""Multi-chip parallelism: mesh construction and sharded GP computations."""

from .mesh import NamedSharding, P, make_mesh, replicated, shard_leading  # noqa: F401
from .sharded import (  # noqa: F401
    sharded_fit_gp_map,
    sharded_gram_mll,
    sharded_predict_diag,
    train_step,
)
