"""Multi-chip parallelism: mesh construction and sharded GP computations."""

from .blocked import blocked_cholesky, dist_gaussian_logp, dist_quad_and_logdet  # noqa: F401
from .iterative import (  # noqa: F401
    dist_iter_fit_gp_map,
    dist_iter_gaussian_logp,
    dist_iter_map_neg_logp,
    dist_iter_posterior_cache,
    pad_for_dist_iter,
)
from .mesh import NamedSharding, P, make_mesh, replicated, shard_leading  # noqa: F401
from .sharded import (  # noqa: F401
    data_sharded_fit_gp_map,
    sharded_fit_fitc_laplace_map,
    sharded_fit_fitc_map,
    sharded_fit_gp_map,
    sharded_fit_kron_map,
    sharded_fit_laplace_map,
    sharded_gram_mll,
    sharded_predict_diag,
    train_step,
)
