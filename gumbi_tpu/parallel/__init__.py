"""Multi-chip parallelism: mesh construction and sharded GP computations."""

from .blocked import blocked_cholesky, dist_gaussian_logp, dist_quad_and_logdet  # noqa: F401
from .mesh import NamedSharding, P, make_mesh, replicated, shard_leading  # noqa: F401
from .sharded import (  # noqa: F401
    data_sharded_fit_gp_map,
    sharded_fit_gp_map,
    sharded_fit_kron_map,
    sharded_gram_mll,
    sharded_predict_diag,
    train_step,
)
