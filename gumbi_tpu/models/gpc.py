"""GP classifier: latent GP + logit link + Bernoulli likelihood.

Counterpart of the reference classifier (reference
gumbi/regression/pymc/extras.py:8-66), redesigned for TPU: rather than
jointly optimizing thousands of latent function values (pm.find_MAP over a
Latent GP), hyperparameters are learned by maximizing the Laplace-approximate
marginal likelihood (Newton mode-finding inside jit), and class probabilities
come from the probit approximation to the logistic-Gaussian integral.

The output column must be binary (0/1). Predictions are latent-space (μ, σ2)
plus :meth:`predict_proba` for class probabilities; posterior probability
surfaces register as logit-normal variables for transform-aware plotting,
mirroring the reference's logit-var registration (extras.py:57).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ..ops import initial_params
from ..ops.kernels import CONTINUOUS_KERNELS
from ..ops.laplace import laplace_neg_logp, laplace_predict
from ..utils import assert_in
from .gp import GP

__all__ = ["GPC"]


class GPC(GP):
    """Gaussian-Process classifier on the Laplace/JAX engine."""

    def build_model(
        self,
        seed=None,
        continuous_kernel="ExpQuad",
        period=None,
        heteroskedastic_inputs=False,
        heteroskedastic_outputs=False,
        sparse=False,
        n_u=100,
        ARD=True,
        ls_bounds=None,
        mass=0.98,
        multitask_kernel=None,
        bucket=None,
    ):
        """Build the latent-GP covariance structure for classification."""
        if heteroskedastic_inputs:
            raise NotImplementedError("The GPC does not support heteroskedastic inputs.")
        if heteroskedastic_outputs:
            raise NotImplementedError("The GPC does not support heteroskedastic outputs.")
        if sparse and bucket:
            raise NotImplementedError(
                "sparse + bucket is unnecessary for the GPC: the FITC-Laplace "
                "fit is O(N·m²), so refits are cheap without padding."
            )
        if multitask_kernel not in (None, "Hadamard"):
            raise NotImplementedError(
                "The GPC latent model is always the tall Hadamard structure "
                "(Kronecker/Independent reformulations assume a Gaussian "
                "likelihood)."
            )
        assert_in("Continuous kernel", continuous_kernel, CONTINUOUS_KERNELS)

        # Reuse the regression build for spec/data/prior construction, then
        # adjust for the latent likelihood: no Gaussian noise, binary targets.
        # (sparse=False here: inducing points are selected below, AFTER the
        # classifier's finite-row filtering, so centers see the real data.)
        super().build_model(
            seed=seed,
            continuous_kernel=continuous_kernel,
            period=period,
            heteroskedastic_inputs=False,
            heteroskedastic_outputs=False,
            sparse=False,
            n_u=n_u,
            ARD=ARD,
            ls_bounds=ls_bounds,
            mass=mass,
            multitask_kernel="Hadamard",
        )
        self.latent = True
        # Bernoulli likelihood: drop σ (and any noise coregion) from the
        # parameter set — the classifier has no Gaussian observation noise.
        import dataclasses

        self._spec = dataclasses.replace(self._spec, likelihood="bernoulli", noise_coreg=None)

        # Targets: raw 0/1 labels, not z-scores.
        _, y_raw = self.get_structured_data("mean")
        y = np.asarray(y_raw.values(), dtype=float).squeeze()
        uniq = set(np.unique(y[np.isfinite(y)]))
        if not uniq <= {0.0, 1.0}:
            raise ValueError(f"GPC requires binary 0/1 outputs; found values {sorted(uniq)}")
        finite = np.isfinite(y)
        y = y[finite]
        xc = np.asarray(self._xc)[finite]
        xk = np.asarray(self._xk)[finite]

        # Bucket padding (lab loops): static shapes across growing datasets.
        # The masked Laplace evidence is EXACT — padded rows carry zero
        # likelihood, so their W vanishes and B gets identity rows
        # (ops/laplace.laplace_mode). Padding happens in host numpy for the
        # same recompile reasons as the regressor (models/gp.py bucket block).
        self._mask = None
        if bucket:
            n = int(xc.shape[0])
            n_pad = (-n) % int(bucket)
            np_dtype = np.dtype(jnp.dtype(self._dtype).name)
            if n_pad:
                xc = np.concatenate([xc, np.zeros((n_pad, xc.shape[1]), dtype=np_dtype)])
                xk = np.concatenate([xk, np.zeros((n_pad, xk.shape[1]), dtype=np.int32)])
                y = np.concatenate([y, np.zeros(n_pad)])
            self._mask = jnp.asarray(
                np.concatenate([np.ones(n, dtype=np_dtype), np.zeros(n_pad, dtype=np_dtype)])
            )
        self._yz = jnp.asarray(y, dtype=self._dtype)
        self._xc = jnp.asarray(xc, dtype=self._dtype)
        self._xk = jnp.asarray(xk, dtype=jnp.int32)

        # Sparse FITC classifier: beyond the reference (sparse + latent is
        # NotImplemented there, ref GP.py:587). k-means inducing points over
        # the filtered data, same recipe as the sparse regressor.
        self.sparse = bool(sparse)
        if sparse:
            from ..ops.fitc import select_inducing

            self._xu_c, self._xu_k = select_inducing(
                xc, xk, n_u, self._spec.d_cont,
                self.seed if seed is None else seed, self._dtype,
                mask=self._mask,
            )
        return self

    def find_MAP(self, n_restarts=8, maxiter=300, tol=1e-6, seed=None, mesh=None, **kwargs):
        """Learn hyperparameters by maximizing the Laplace marginal likelihood.

        With ``mesh`` (a :func:`gumbi_tpu.parallel.make_mesh` mesh) the
        restart sweep shards over the devices — the Laplace/FITC-Laplace
        evidences are pure functions of the hyperparameters, so classifier
        restart parallelism is identical to the regressor's
        (:mod:`gumbi_tpu.parallel.sharded`). Results match the single-device
        fit (same objective, same restarts, argmin across devices).
        """
        assert self._spec is not None, "Call build_model first"
        seed = self.seed if seed is None else seed

        u0s = initial_params(
            self._spec, self._ls_alpha, self._ls_beta, n_restarts=n_restarts, seed=seed,
            dtype=self._dtype,
        )
        ls_alpha = jnp.asarray(self._ls_alpha, dtype=self._dtype)
        ls_beta = jnp.asarray(self._ls_beta, dtype=self._dtype)

        if mesh is not None:
            from ..ops.priors import unconstrain
            from ..parallel import sharded_fit_fitc_laplace_map, sharded_fit_laplace_map

            if self.sparse:
                params, f_best, aux = sharded_fit_fitc_laplace_map(
                    mesh, self._spec, self._xc, self._xk, self._xu_c, self._xu_k,
                    self._yz, ls_alpha, ls_beta, u0s,
                    maxiter=maxiter, tol=tol, mask=self._mask,
                )
            else:
                params, f_best, aux = sharded_fit_laplace_map(
                    mesh, self._spec, self._xc, self._xk, self._yz,
                    ls_alpha, ls_beta, u0s,
                    maxiter=maxiter, tol=tol, mask=self._mask,
                )
            u_best = unconstrain(params)
        elif self.sparse:
            # FITC-Laplace: O(N·m²) evidence, gradients through the Newton
            # loop directly (only an m×m factorization inside).
            from ..ops.optimize import fit_fitc_laplace_map

            u_best, f_best, aux = fit_fitc_laplace_map(
                self._spec, self._xc, self._xk, self._xu_c, self._xu_k,
                self._yz, ls_alpha, ls_beta, u0s,
                maxiter=maxiter, tol=tol, mask=self._mask,
            )
        else:
            # laplace_mll ships the exact analytic gradient at the mode as a
            # custom VJP (GPML eqs. 5.21-5.24, ops/laplace.py), so gradients
            # never differentiate through the inner Newton loop's Cholesky and
            # restarts use the same per-backend default mode as the regressor.
            # fit_laplace_map is a module-level jit: repeated classifier fits
            # reuse one compiled program per (spec, shapes).
            from ..ops.optimize import fit_laplace_map

            u_best, f_best, aux = fit_laplace_map(
                self._spec, self._xc, self._xk, self._yz, ls_alpha, ls_beta, u0s,
                maxiter=maxiter, tol=tol, mask=self._mask,
            )
        from ..ops.priors import constrain

        self._params = constrain(u_best)
        self._neg_logp = float(f_best)
        self._fit_aux = {k: np.asarray(v) for k, v in aux.items()}
        self.MAP = {k: np.asarray(v) for k, v in self._params.items()}
        self._cache = None  # classifier uses the Laplace predictor directly
        return self.MAP

    def sample(
        self,
        draws=500,
        tune=500,
        chains=None,
        seed=None,
        n_leapfrog=32,
        target_accept=None,
        latent=False,
        ess_sweeps=4,
        sampler="chees",
        **kwargs,
    ):
        """Sample the classifier posterior.

        Two modes, both single-XLA-program on device:

        * ``latent=False`` (default): ChEES-HMC (or ``sampler='hmc'`` for
          fixed-trajectory HMC) over hyperparameters under the
          Laplace-approximate marginal — a low-dimensional, well-conditioned
          target. Trajectory-length semantics as in :meth:`GP.sample`.
        * ``latent=True``: full-Bayes over the *joint* (latent field,
          hyperparameter) posterior — the reference's semantics (joint NUTS,
          extras.py:36-43) — via elliptical slice sampling on whitened
          latents composed with adaptive random-walk Metropolis on the
          hyperparameters (:mod:`gumbi_tpu.ops.ess`). The trace additionally
          carries ``_latent_f`` (chains, draws, N) latent function draws at
          the training points, which :meth:`predict_proba` integrates over
          when passed as ``source``.

        ``target_accept`` defaults per kernel: 0.8 for HMC (latent=False),
        0.3 for the random-walk Metropolis hyper move (latent=True, near the
        0.234 RWM optimum); pass a value to override either.
        """
        import jax

        from ..ops.priors import constrain, unconstrain

        assert self._spec is not None, "Call build_model first"
        seed = self.seed if seed is None else seed
        ls_alpha = jnp.asarray(self._ls_alpha, dtype=self._dtype)
        ls_beta = jnp.asarray(self._ls_beta, dtype=self._dtype)

        if self._params is not None:
            q0 = unconstrain(self._params)
        else:
            u0s = initial_params(self._spec, self._ls_alpha, self._ls_beta, 1, seed, dtype=self._dtype)
            q0 = {k: v[0] for k, v in u0s.items()}

        if chains is None:
            chains = 2 if latent else (16 if sampler == "chees" else 2)
        if latent:
            if self.sparse:
                raise NotImplementedError(
                    "sample(latent=True) runs on the dense latent field; the "
                    "sparse FITC classifier samples hyperparameters only "
                    "(latent=False)."
                )
            from ..ops.ess import ess_gpc_sample

            usamples, f_draws, stats = ess_gpc_sample(
                self._spec, q0, self._xc, self._xk, self._yz,
                ls_alpha, ls_beta, jax.random.PRNGKey(seed),
                draws=draws, tune=tune, chains=chains, ess_sweeps=ess_sweeps,
                target_accept=0.3 if target_accept is None else float(target_accept),
                mask=self._mask,
            )
            natural = constrain(usamples)
            self.trace = {k: np.asarray(v) for k, v in natural.items()}
            self.trace["_latent_f"] = np.asarray(f_draws)
            self.trace["_stats"] = {k: np.asarray(v) for k, v in stats.items()}
            return self.trace

        from ..ops.hmc import chees_sample, hmc_sample

        if sampler not in ("chees", "hmc"):
            raise ValueError(f"sampler must be 'chees' or 'hmc', got {sampler!r}")
        if self.sparse:
            from ..ops.fitc_laplace import fitc_laplace_neg_logp

            def logp(uparams):
                return -fitc_laplace_neg_logp(
                    self._spec, uparams, self._xc, self._xk,
                    self._xu_c, self._xu_k, self._yz, ls_alpha, ls_beta,
                    mask=self._mask,
                )
        else:
            def logp(uparams):
                return -laplace_neg_logp(
                    self._spec, uparams, self._xc, self._xk, self._yz, ls_alpha, ls_beta,
                    mask=self._mask,
                )

        if sampler == "chees":
            usamples, stats = chees_sample(
                logp, q0, jax.random.PRNGKey(seed),
                draws=draws, tune=tune, chains=chains,
                target_accept=0.75 if target_accept is None else float(target_accept),
            )
        else:
            usamples, stats = hmc_sample(
                logp, q0, jax.random.PRNGKey(seed),
                draws=draws, tune=tune, chains=chains, n_leapfrog=n_leapfrog,
                target_accept=0.8 if target_accept is None else float(target_accept),
            )
        natural = constrain(usamples)
        self.trace = {k: np.asarray(v) for k, v in natural.items()}
        self.trace["_stats"] = {k: np.asarray(v) for k, v in stats.items()}
        return self.trace

    def predict(self, points_array, with_noise=True, additive_level="total", **kwargs):
        """Latent-function (mean, variance) at a tall dims-ordered points array."""
        if additive_level != "total":
            raise NotImplementedError("Prediction for additive sublevels is not yet supported.")
        assert self._params is not None, "Model must be fit before predicting"
        xc, xk = self._split_X(np.asarray(points_array))
        if self.sparse:
            from ..ops.fitc_laplace import fitc_laplace_predict

            mean, var, prob = fitc_laplace_predict(
                self._spec, self._params, self._xc, self._xk,
                self._xu_c, self._xu_k, self._yz, xc, xk, mask=self._mask,
            )
        else:
            mean, var, prob = laplace_predict(
                self._spec, self._params, self._xc, self._xk, self._yz, xc, xk,
                mask=self._mask,
            )
        self._last_prob = np.asarray(prob)
        return np.asarray(mean), np.asarray(var)

    def draw_point_samples(
        self, points, n_samples=1, output=None, with_noise=False, seed=None, source=None,
        additive_level="total", var_name="posterior_samples", increment_var=True,
    ):
        """Posterior probability draws at supplied points.

        Latent-function draws from the Laplace posterior pushed through the
        logistic link. The sampled variable registers as a logit-normal for
        transform-aware downstream use (reference extras.py:57).
        ``var_name``/``increment_var`` follow the reference bookkeeping
        (stored in :attr:`sample_vars`); sublevel draws of the latent field
        are not implemented.
        """
        import jax
        from scipy.special import expit

        from ..ops.laplace import laplace_draw_latent

        if additive_level != "total":
            raise NotImplementedError(
                "Sublevel draws of the classifier's latent field are not "
                "implemented (the Laplace cache factorizes the total kernel)."
            )
        output = self._parse_prediction_output(output)
        points_array, _, _ = self._prepare_points_for_prediction(points, output=output)
        xc, xk = self._split_X(np.asarray(points_array))
        key = jax.random.PRNGKey(self.seed if seed is None else seed)
        if self.sparse:
            from ..ops.fitc_laplace import fitc_laplace_draw_latent

            f_draws = fitc_laplace_draw_latent(
                self._spec, self._params, self._xc, self._xk,
                self._xu_c, self._xu_k, self._yz, xc, xk, key,
                n_samples=n_samples, mask=self._mask,
            )
        else:
            f_draws = laplace_draw_latent(
                self._spec, self._params, self._xc, self._xk, self._yz, xc, xk, key,
                n_samples=n_samples, mask=self._mask,
            )
        p_draws = expit(np.asarray(f_draws))
        name = output[0]
        if name not in self.stdzr.logit_vars:
            self.stdzr.logit_vars = self.stdzr.logit_vars + [name]
        self.predictions = self.parray(**{name: p_draws})
        self.predictions_X = points
        self._store_sample_var(var_name, increment_var, self.predictions)
        return self.predictions

    def draw_grid_samples(self, n_samples=1, output=None, categorical_levels=None, **kwargs):
        """Posterior probability draws over the prepared grid."""
        if self.grid_points is None:
            raise ValueError("Grid must first be specified with `prepare_grid`")
        points = self.grid_points
        if self.categorical_dims:
            points = self.append_categorical_points(points, categorical_levels=categorical_levels)
        samples = self.draw_point_samples(points, n_samples=n_samples, output=output, **kwargs)
        self.predictions = samples.reshape(-1, *self.grid_parray.shape)
        self.predictions_X = self.predictions_X.reshape(self.grid_parray.shape)
        return self.predictions

    def predict_proba(self, points, output=None, source=None, max_draws=64, seed=None):
        """Class probability P(y=1) at a 1-D parray of coordinates.

        ``source=None`` uses the Laplace approximation at the MAP
        hyperparameters. Passing a trace from :meth:`sample` with
        ``latent=True`` integrates over the joint (latent, hyperparameter)
        posterior instead: for each of ``max_draws`` subsampled (θ, f)
        draws, the exact Gaussian conditional at θ given f yields the f*
        marginals, pushed through the probit-logistic approximation and
        averaged — the full-Bayes probability surface (reference semantics,
        ref GP.py:924-979).
        """
        output = self._parse_prediction_output(output)
        points_array, _, _ = self._prepare_points_for_prediction(points, output=output)
        if source is not None:
            if "_latent_f" not in source:
                raise ValueError(
                    "predict_proba(source=...) needs a trace from "
                    "sample(latent=True) (no '_latent_f' in the supplied trace)."
                )
            import jax

            from ..ops.ess import latent_conditional_proba

            xc, xk = self._split_X(np.asarray(points_array))
            f = np.asarray(source["_latent_f"])  # (chains, draws, N)
            S_all = f.shape[0] * f.shape[1]
            f_flat = f.reshape(S_all, -1)
            params_flat = {
                k: np.asarray(v).reshape(S_all, *np.asarray(v).shape[2:])
                for k, v in source.items()
                if not k.startswith("_")
            }
            rng = np.random.default_rng(self.seed if seed is None else seed)
            idx = (
                rng.choice(S_all, max_draws, replace=False)
                if S_all > max_draws
                else np.arange(S_all)
            )
            params_stack = {
                k: jnp.asarray(v[idx], dtype=self._dtype) for k, v in params_flat.items()
            }
            f_stack = jnp.asarray(f_flat[idx], dtype=self._dtype)
            proba = latent_conditional_proba(
                self._spec, params_stack, f_stack, self._xc, self._xk, xc, xk
            )
            self._last_prob = np.asarray(proba)
            return self._last_prob
        self.predict(points_array)
        return self._last_prob

    def predict_grid_proba(self, output=None, categorical_levels=None):
        """Class probability over the prepared grid."""
        if self.grid_points is None:
            raise ValueError("Grid must first be specified with `prepare_grid`")
        points = self.grid_points
        if self.categorical_dims:
            points = self.append_categorical_points(points, categorical_levels=categorical_levels)
        proba = self.predict_proba(points, output=output)
        return proba.reshape(self.grid_parray.shape)
