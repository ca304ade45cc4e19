"""JAX/XLA/Pallas compute core: kernels, likelihoods, optimizers, posteriors."""

from .kernels import (  # noqa: F401
    CONTINUOUS_KERNELS,
    CoregTerm,
    GPSpec,
    GPTerm,
    coreg_matrix,
    gram,
    gram_diag,
    noise_diag,
    output_correlation,
)
from .iterative import (  # noqa: F401
    IterConfig,
    draw_probes,
    iter_gaussian_logp,
    iter_map_neg_logp,
    iter_posterior_cache,
    iter_predict_diag,
    iter_predict_mean,
)
from .mll import DEFAULT_JITTER, cholesky_factor, map_neg_logp, mll  # noqa: F401
from .optimize import fit_gp_map, lbfgs_minimize, multi_restart_minimize  # noqa: F401
from .posterior import (  # noqa: F401
    PosteriorCache,
    draw_samples,
    posterior_cache,
    predict_cov,
    predict_diag,
)
from .priors import (  # noqa: F401
    constrain,
    fit_inverse_gamma,
    initial_params,
    log_prior,
    ls_prior_params,
    param_info,
    unconstrain,
)
