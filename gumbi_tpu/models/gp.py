"""GP surface learning on the JAX engine — the primary user-facing model.

Same model family as the reference marginal GP (reference
gumbi/regression/pymc/GP.py:21-979): product of a continuous (+linear) kernel
with ICM coregion kernels per categorical dimension and per output, white
noise with optional output heteroskedasticity, InverseGamma/Gamma/Normal
hyperpriors, MAP hyperparameters. The inference engine is new: everything
compiles to one XLA program per model structure — Gram assembly on the MXU,
Cholesky-based MLL with autodiff gradients, and vmapped multi-restart L-BFGS
on device (replacing pm.find_MAP's scipy loop).
"""

from __future__ import annotations

import dataclasses
import os
import warnings

import numpy as np

import jax
import jax.numpy as jnp

from ..aggregation import DataSet
from ..utils import assert_in
from ..utils.jax_utils import default_model_dtype
from ..ops import (
    CoregTerm,
    GPSpec,
    GPTerm,
    fit_gp_map,
    initial_params,
    ls_prior_params,
    output_correlation,
    posterior_cache,
    predict_diag,
    draw_samples,
)
from ..ops.kernels import CONTINUOUS_KERNELS, gram
from .base import Regressor

__all__ = ["GP"]


class GP(Regressor):
    r"""Gaussian-Process surface learner (JAX/TPU backend).

    Main entry point is :meth:`fit`, which parses dimensions
    (:meth:`specify_model`), compiles the covariance structure
    (:meth:`build_model`), and learns MAP hyperparameters
    (:meth:`find_MAP`) by vmapped multi-restart L-BFGS on device.

    Examples
    --------
    >>> import gumbi_tpu as gmb
    >>> cars = gmb.data.cars()
    >>> ds = gmb.DataSet(cars, outputs=['mpg', 'acceleration'],
    ...                  log_vars=['mpg', 'acceleration', 'horsepower'])
    >>> gp = gmb.GP(ds).fit(outputs=['mpg'], continuous_dims=['horsepower'])
    >>> X = gp.prepare_grid()
    >>> y = gp.predict_grid()
    >>> gmb.ParrayPlotter(X, y).plot()
    """

    def __init__(self, dataset: DataSet, outputs=None, seed=2021, dtype=None):
        super().__init__(dataset, outputs, seed)

        self.model = None  # GPSpec once built
        self.MAP = None
        self.trace = None

        self.continuous_kernel = "ExpQuad"
        self.heteroskedastic_inputs = False
        self.heteroskedastic_outputs = True
        self.sparse = False
        self.latent = False
        self.n_u = 100

        # Engine state
        self._spec = None
        self._xc = None
        self._xk = None
        self._yz = None
        self._ls_alpha = None
        self._ls_beta = None
        self._params = None
        self._cache = None
        self._cat_maps = {}
        self._structure = "Hadamard"
        self._mask = None
        # Iterative-engine (mBCG) state; populated by _find_MAP_iterative
        self._iter_cache = None
        self._iter_state = None
        # Heteroskedastic-input (noise GP) state; populated by _find_MAP_het
        self._noise_params = None
        self._noise_cache = None
        self._noise_mult = None
        self._noise_stats = None
        # Engine dtype: f32 on TPU (f64 is emulated there), f64 elsewhere
        # under x64; override per model with dtype=... or globally with
        # GUMBI_TPU_X64 (utils/jax_utils.default_model_dtype).
        self._dtype = (
            default_model_dtype() if dtype is None else jnp.dtype(dtype).type
        )

        self.model_specs = {
            "seed": self.seed,
            "continuous_kernel": self.continuous_kernel,
            "heteroskedastic_inputs": self.heteroskedastic_inputs,
            "heteroskedastic_outputs": self.heteroskedastic_outputs,
            "sparse": self.sparse,
            "n_u": self.n_u,
            "multitask_kernel": None,
            "ARD": True,
        }

    ################################################################################
    # Fitting
    ################################################################################

    def fit(
        self,
        outputs=None,
        linear_dims=None,
        continuous_dims=None,
        continuous_levels=None,
        continuous_coords=None,
        categorical_dims=None,
        categorical_levels=None,
        additive=False,
        seed=None,
        continuous_kernel="ExpQuad",
        period=None,
        heteroskedastic_inputs=False,
        heteroskedastic_outputs=True,
        sparse=False,
        n_u=100,
        ARD=True,
        ls_bounds=None,
        mass=0.98,
        multitask_kernel=None,
        bucket=None,
        spec_kwargs=None,
        build_kwargs=None,
        MAP_kwargs=None,
    ):
        """Fit a GP surface: specify → build → MAP.

        See :meth:`build_model` for the model-structure arguments and
        :meth:`find_MAP` for optimizer controls (pass via ``MAP_kwargs``).
        """
        from ..utils.profiling import phase

        with phase("specify_model"):
            self.specify_model(
                outputs=outputs,
                linear_dims=linear_dims,
                continuous_dims=continuous_dims,
                continuous_levels=continuous_levels,
                continuous_coords=continuous_coords,
                categorical_dims=categorical_dims,
                categorical_levels=categorical_levels,
                additive=additive,
                **(spec_kwargs or {}),
            )
        with phase("build_model"):
            self.build_model(
                seed=seed,
                continuous_kernel=continuous_kernel,
                period=period,
                heteroskedastic_inputs=heteroskedastic_inputs,
                heteroskedastic_outputs=heteroskedastic_outputs,
                sparse=sparse,
                n_u=n_u,
                ARD=ARD,
                ls_bounds=ls_bounds,
                mass=mass,
                multitask_kernel=multitask_kernel,
                bucket=bucket,
                **(build_kwargs or {}),
            )
        with phase("find_MAP"):
            self.find_MAP(**(MAP_kwargs or {}))
        return self

    # ------------------------------------------------------------------
    # Model construction
    # ------------------------------------------------------------------

    def _split_X(self, X):
        """Split a tall dims-ordered matrix into continuous (float) and
        categorical (int index) blocks, remapping coords to 0..d_out-1."""
        d_cont = len(self.continuous_dims)
        # dtype conversion happens in HOST numpy: jnp.asarray(..., dtype=)
        # on a mismatched-dtype array dispatches an eager convert_element_type
        # whose compile (~0.4 s via the remote TPU compiler) recurs at every
        # new data size in a lab loop. np.asarray + device_put compiles nothing.
        np_dtype = np.dtype(jnp.dtype(self._dtype).name)
        xc = jnp.asarray(np.asarray(X[:, :d_cont], dtype=np_dtype))
        cat_cols = []
        for j, dim in enumerate(self.categorical_dims):
            raw = np.asarray(X[:, d_cont + j], dtype=float)
            sorted_coords = self._cat_maps[dim]
            idx = np.searchsorted(sorted_coords, np.round(raw, 9))
            cat_cols.append(idx)
        xk = jnp.asarray(
            np.column_stack(cat_cols).astype(np.int32)
            if cat_cols
            else np.zeros((X.shape[0], 0), dtype=np.int32)
        )
        return xc, xk

    def _reduced_xk(self, xk_np):
        """Xk with the output column dropped (Independent sub-model layout)."""
        keep = self._ind_keep
        xk_np = np.asarray(xk_np)
        if not keep:
            return jnp.zeros((xk_np.shape[0], 0), dtype=jnp.int32)
        return jnp.asarray(xk_np[:, keep].astype(np.int32))

    def _split_ind_data(self):
        """Per-output data blocks: rows of output j, with the output column
        dropped from Xk (Independent sub-model coregs index the reduced Xk)."""
        out_idx = self.categorical_dims.index(self.out_col)
        self._ind_out_idx = out_idx
        self._ind_keep = [jj for jj in range(self._xk.shape[1]) if jj != out_idx]
        xk_np = np.asarray(self._xk)
        self._ind_data = []
        for j in range(len(self.outputs)):
            rows = np.where(xk_np[:, out_idx] == j)[0]
            self._ind_data.append(
                (self._xc[rows], self._reduced_xk(xk_np[rows]), self._yz[rows])
            )

    def _ind_output_index(self, name):
        """Coregion code of output ``name`` (the index into _ind_params)."""
        sorted_coords = self._cat_maps[self.out_col]
        coord = float(self.categorical_coords[self.out_col][name])
        return int(np.searchsorted(sorted_coords, np.round(coord, 9)))

    def _build_cat_maps(self):
        self._cat_maps = {
            dim: np.sort(np.asarray(list(self.categorical_coords[dim].values()), dtype=float))
            for dim in self.categorical_dims
        }

    def _prepare_ls_bounds(self, X_s, ARD, ls_bounds):
        """Per-dimension (lower, upper) lengthscale bounds.

        Parses the optional user parray of z-space deltas (NaN entries keep
        the data-driven default), then delegates the pairwise-distance
        defaults to :func:`gumbi_tpu.utils.gp_utils.parse_ls_limits` — the
        single implementation of the bound logic (reference
        utils/gp_utils.py:15-48). Dimensions absent from ``ls_bounds`` fall
        back to the defaults.
        """
        from ..utils.gp_utils import parse_ls_limits

        n_sets = X_s.shape[1] if ARD else 1
        lowers = [None] * n_sets
        uppers = [None] * n_sets
        if ls_bounds is not None:
            # Assign bounds BY NAME, one slot per continuous dim: positional
            # packing (as in the reference, ref pymc/GP.py:634-640) silently
            # shifts a partial bound set onto the wrong dimensions.
            user = []
            for dim in self.continuous_dims:
                b = [None, None]
                if dim in ls_bounds.names:
                    vals = ls_bounds[dim].z.values().squeeze()
                    given = [None if np.isnan(v) else float(v) for v in np.atleast_1d(vals)]
                    b = (given + [None] * 2)[:2]
                user.append(b)
            named = [b for b in user if b != [None, None]]
            if not ARD:
                if len(named) != 1:
                    raise ValueError(
                        "Bounds must be specified for only a single dimension if ARD is False"
                    )
                user = named  # the one shared lengthscale set
            lowers = [b[0] for b in user[:n_sets]]
            uppers = [b[1] for b in user[:n_sets]]
        return parse_ls_limits(np.asarray(X_s), ARD=ARD, lower=lowers, upper=uppers)

    def build_model(
        self,
        seed=None,
        continuous_kernel="ExpQuad",
        period=None,
        heteroskedastic_inputs=False,
        heteroskedastic_outputs=True,
        sparse=False,
        n_u=100,
        ARD=True,
        ls_bounds=None,
        mass=0.98,
        multitask_kernel=None,
        bucket=None,
    ):
        r"""Compile the covariance structure and priors for the current spec.

        Model (reference GP.py:61-94): y ~ N(μ, σ); μ ~ GP(K);
        K = (K_cont + K_lin)·K_coreg_outputs·∏ K_coreg_cat, with an additive
        per-category variant when ``additive=True``.

        ``bucket``: pad the training set to the next multiple of this size
        with masked rows (exact MLL; identity rows contribute zero), so
        growing datasets reuse the compiled fit program instead of
        recompiling every lab-loop round. Forces the Hadamard structure.

        ``multitask_kernel``: None (auto), 'Kronecker', or 'Hadamard'.
        When every output is observed at identical locations the Kronecker
        reformulation is numerically identical but ~D² cheaper (batched
        (D, N, N) Cholesky instead of one (ND, ND)); auto selects it whenever
        the structure allows. 'Hadamard' forces the tall path.

        ``heteroskedastic_inputs``: model input-dependent observation noise
        via the most-likely heteroskedastic GP (Kersting et al. 2007): a
        second GP fit to log expected squared residuals supplies a per-row
        relative noise variance; prediction adds the location-dependent
        noise at new points. Beyond the reference (NotImplemented in both
        its backends, ref GP.py:518-519, botorch/GP.py:142-143). Dense
        Hadamard structure only. Tune with ``MAP_kwargs=dict(het_iters=k)``.
        """
        if heteroskedastic_inputs:
            # Input-dependent noise via the most-likely heteroskedastic GP
            # (Kersting et al. 2007): a second GP over log squared residuals
            # supplies a per-row relative noise variance for the main fit.
            # A capability the reference declares NotImplemented in BOTH
            # backends (ref gumbi/regression/pymc/GP.py:518-519,
            # botorch/GP.py:142-143). Dense (Hadamard) structure only: the
            # per-row noise diagonal breaks the Kronecker batching, FITC's
            # diagonal correction already absorbs input-dependent slack, and
            # the Independent split would need one noise GP per output.
            if sparse:
                raise NotImplementedError(
                    "heteroskedastic_inputs does not compose with sparse FITC."
                )
            if bucket:
                raise NotImplementedError(
                    "heteroskedastic_inputs does not compose with bucket padding "
                    "(the noise-GP targets are per observed row)."
                )
            if multitask_kernel in ("Kronecker", "Independent"):
                raise NotImplementedError(
                    "heteroskedastic_inputs requires the dense Hadamard structure "
                    "(per-row noise breaks the Kronecker/Independent batching)."
                )
            multitask_kernel = "Hadamard"
        assert_in("Continuous kernel", continuous_kernel, CONTINUOUS_KERNELS)

        X, y = self.get_shaped_data("mean")
        d_cont = len(self.continuous_dims)
        assert X.shape[1] == len(self.dims)

        seed = self.seed if seed is None else seed
        self.seed = seed
        self.continuous_kernel = continuous_kernel
        self.heteroskedastic_inputs = heteroskedastic_inputs
        self.heteroskedastic_outputs = heteroskedastic_outputs
        self.sparse = sparse
        self.n_u = n_u
        self.latent = False
        # Full build config so cross_validate's train-subset refits
        # (base.py build_model(**model_specs)) reproduce the same structure
        # choice and priors (reference echoes its config the same way,
        # ref gumbi/regression/pymc/GP.py:534-541).
        self.model_specs = {
            "seed": seed,
            "continuous_kernel": continuous_kernel,
            "period": period,
            "heteroskedastic_inputs": heteroskedastic_inputs,
            "heteroskedastic_outputs": heteroskedastic_outputs,
            "sparse": sparse,
            "n_u": n_u,
            "ARD": ARD,
            "ls_bounds": ls_bounds,
            "mass": mass,
            "multitask_kernel": multitask_kernel,
            "bucket": bucket,
        }

        # Period (z-space) per continuous dim for periodic kernels
        period_z = None
        if "Periodic" in continuous_kernel:
            if continuous_kernel != "Periodic" and period is None:
                raise ValueError("Period must be specified for periodic kernel")
            if period is not None:
                zp = [float(period.z[d + "_z"].values()) for d in self.continuous_dims]
                period_z = tuple(zp)

        # Reset per-build padding state up front: the Independent branch
        # returns early (before the bucket block below), and a stale mask
        # from a previous bucketed build would corrupt predict/save/propose.
        self._mask = None
        # Reset heteroskedastic-input state: a stale noise GP from a previous
        # build would silently reshape the predictive noise.
        self._noise_params = None
        self._noise_cache = None
        self._noise_mult = None
        self._noise_stats = None

        self._build_cat_maps()
        linear_idx = tuple(self.continuous_dims.index(d) for d in self.linear_dims)

        # Coregion factors per categorical dim (output column last)
        coreg_terms = {}
        for j, dim in enumerate(self.categorical_dims):
            coreg_terms[dim] = CoregTerm(
                name=dim, col=j, d_out=len(self.categorical_levels[dim])
            )
        out_cg = coreg_terms.get(self.out_col)

        if not self.additive:
            all_coregs = tuple(coreg_terms[d] for d in self.categorical_dims)
            terms = (
                GPTerm(
                    suffix="total",
                    kernel=continuous_kernel,
                    linear_idx=linear_idx,
                    coregs=all_coregs,
                ),
            )
        else:
            # Global term: continuous (+linear) × output coregion only
            global_coregs = (out_cg,) if out_cg is not None else ()
            terms = [
                GPTerm(
                    suffix="total",
                    kernel=continuous_kernel,
                    linear_idx=linear_idx,
                    coregs=global_coregs,
                )
            ]
            for dim in self.categorical_dims:
                if dim == self.out_col:
                    continue
                coregs = (coreg_terms[dim],) + ((out_cg,) if out_cg is not None else ())
                terms.append(
                    GPTerm(
                        suffix=dim,
                        kernel=continuous_kernel,
                        linear_idx=linear_idx,
                        coregs=coregs,
                    )
                )
            terms = tuple(terms)

        noise_coreg = None
        if heteroskedastic_outputs and self.out_col in self.categorical_dims:
            out_j = self.categorical_dims.index(self.out_col)
            noise_coreg = CoregTerm(
                name="Output_noise", col=out_j, d_out=len(self.outputs)
            )
            if sparse:
                warnings.warn(
                    "Heteroskedasticity over outputs is not yet implemented for sparse GP. "
                    "Reverting to scalar-valued noise."
                )
                noise_coreg = None

        self._spec = GPSpec(
            terms=terms,
            d_cont=d_cont,
            ard=ARD,
            noise_coreg=noise_coreg,
            period=period_z,
        )
        self.model = self._spec

        # Engine data (host-side dtype conversion — see _split_X)
        self._xc, self._xk = self._split_X(X)
        self._yz = jnp.asarray(
            np.asarray(y, dtype=np.dtype(jnp.dtype(self._dtype).name))
        )

        # Structure selection: Kronecker fast path when all outputs share the
        # same locations and the only categorical factor is the output column.
        if multitask_kernel is not None:
            multitask_kernel = multitask_kernel.capitalize()
            assert_in(
                "multitask_kernel", multitask_kernel, ["Kronecker", "Hadamard", "Independent"]
            )
        self._structure = "Hadamard"
        d_out = len(self.outputs)

        if multitask_kernel == "Independent" and d_out > 1:
            # Per-output single-task GPs: separate kernels, no learned
            # cross-output correlation (reference ModelListGP,
            # gumbi/regression/botorch/GP.py:253-267). Composes with extra
            # categorical dims and additive structure like the reference
            # ModelListGP does: each sub-model keeps every coregion factor
            # except the output column and the full additive term structure.
            if sparse:
                raise NotImplementedError(
                    "Independent structure does not compose with sparse FITC "
                    "(the reference's ModelListGP is exact-only); fit per-output "
                    "sparse GPs directly or use the Hadamard structure."
                )
            if bucket:
                raise NotImplementedError(
                    "Bucket padding is not implemented for the Independent "
                    "structure (per-output blocks have their own shapes)."
                )
            self._structure = "Independent"
            out_idx = self.categorical_dims.index(self.out_col)
            sub_cats = [d for d in self.categorical_dims if d != self.out_col]
            # Coregion factors index the REDUCED Xk (output column dropped)
            sub_coreg = {
                d: CoregTerm(name=d, col=jj, d_out=len(self.categorical_levels[d]))
                for jj, d in enumerate(sub_cats)
            }
            if not self.additive:
                ind_terms = (
                    GPTerm(
                        suffix="total",
                        kernel=continuous_kernel,
                        linear_idx=linear_idx,
                        coregs=tuple(sub_coreg[d] for d in sub_cats),
                    ),
                )
            else:
                ind_terms = [
                    GPTerm(
                        suffix="total", kernel=continuous_kernel, linear_idx=linear_idx
                    )
                ]
                for dim in sub_cats:
                    ind_terms.append(
                        GPTerm(
                            suffix=dim,
                            kernel=continuous_kernel,
                            linear_idx=linear_idx,
                            coregs=(sub_coreg[dim],),
                        )
                    )
                ind_terms = tuple(ind_terms)
            self._ind_spec = GPSpec(
                terms=ind_terms,
                d_cont=d_cont,
                ard=ARD,
                period=period_z if "Periodic" in continuous_kernel else None,
            )
            self._spec = self._ind_spec
            self.model = self._spec
            self._split_ind_data()
            X_s = np.asarray(self._xc)[:, :d_cont]
            lowers, uppers = self._prepare_ls_bounds(np.asarray(X_s, dtype=float), ARD, ls_bounds)
            self._ls_alpha, self._ls_beta = ls_prior_params(lowers, uppers, mass=mass)
            return self
        kron_structure_ok = (
            not self.additive
            and not sparse
            and bucket is None
            and d_out > 1
            and self.categorical_dims == [self.out_col]
            and multitask_kernel != "Hadamard"
        )
        if kron_structure_ok:
            n_tall = int(self._xc.shape[0])
            if n_tall % d_out == 0:
                n_loc = n_tall // d_out
                xc_np = np.asarray(self._xc)
                xk_np = np.asarray(self._xk[:, 0])
                blocks_equal = all(
                    np.array_equal(xc_np[:n_loc], xc_np[j * n_loc : (j + 1) * n_loc])
                    and np.all(xk_np[j * n_loc : (j + 1) * n_loc] == xk_np[j * n_loc])
                    for j in range(d_out)
                )
                if blocks_equal:
                    self._structure = "Kronecker"
                    self._xc_locs = self._xc[:n_loc]
                    # Column j of Y = output with coregion index j; tall blocks
                    # are output-major in index order already.
                    order = np.argsort(xk_np[::n_loc], kind="stable")
                    Y = np.asarray(self._yz).reshape(d_out, n_loc)[order].T
                    self._Y = jnp.asarray(Y, dtype=self._dtype)
        if multitask_kernel == "Kronecker" and self._structure != "Kronecker":
            raise ValueError(
                "Kronecker structure requested but outputs are not all observed "
                "at identical locations (or the model has extra categorical dims, "
                "or bucketing is enabled)."
            )

        # Bucket padding: static shapes across growing datasets (exact MLL
        # via masked identity rows; see ops/mll.cholesky_factor). Padding
        # happens in HOST numpy: eager jnp.concatenate at a data-dependent
        # shape compiles a fresh tiny program at EVERY lab-loop round
        # (~0.37 s each through the remote TPU compiler — measured 4 s/round
        # of pure build_model overhead); np.concatenate + one device_put
        # compiles nothing.
        self._mask = None
        if bucket:
            n = int(self._xc.shape[0])
            n_pad = (-n) % int(bucket)
            np_dtype = np.dtype(jnp.dtype(self._dtype).name)
            if n_pad:
                xc_np = np.asarray(self._xc)
                xk_np = np.asarray(self._xk)
                yz_np = np.asarray(self._yz)
                self._xc = jnp.asarray(
                    np.concatenate(
                        [xc_np, np.zeros((n_pad, xc_np.shape[1]), dtype=np_dtype)]
                    )
                )
                self._xk = jnp.asarray(
                    np.concatenate(
                        [xk_np, np.zeros((n_pad, xk_np.shape[1]), dtype=np.int32)]
                    )
                )
                self._yz = jnp.asarray(
                    np.concatenate([yz_np, np.zeros(n_pad, dtype=np_dtype)])
                )
            self._mask = jnp.asarray(
                np.concatenate(
                    [np.ones(n, dtype=np_dtype), np.zeros(n_pad, dtype=np_dtype)]
                )
            )

        # Lengthscale priors from pairwise distances of the continuous block
        X_s = np.asarray(X[:, :d_cont], dtype=float)
        lowers, uppers = self._prepare_ls_bounds(X_s, ARD, ls_bounds)
        self._ls_alpha, self._ls_beta = ls_prior_params(lowers, uppers, mass=mass)

        if sparse:
            from ..ops.fitc import select_inducing

            # k-means over the stacked (continuous z, categorical index) matrix
            # of REAL rows (bucket padding excluded), categorical columns
            # snapped back to valid level indices.
            self._xu_c, self._xu_k = select_inducing(
                self._xc, self._xk, n_u, d_cont, seed, self._dtype,
                mask=self._mask,
            )
        return self

    @property
    def D_tasks(self):
        """Number of output tasks (reference gumbi/regression/botorch/GP.py:47-48)."""
        return len(self.outputs)

    @property
    def task_idxs(self):
        """Output-name → task-coordinate map (reference botorch/GP.py:50-55)."""
        from ..utils import one

        if self.D_tasks == 1:
            return {one(self.outputs): 0}
        return self.categorical_coords[self.out_col]

    def get_separated_data(self, metric="mean", dropna=True):
        """Per-output ``([X...], [y...])`` lists, split on the output
        coordinate column of the tall shaped data with that column removed
        (reference gumbi/regression/botorch/GP.py:283-294; numpy arrays here
        instead of torch tensors)."""
        X, y = self.get_shaped_data(metric=metric, dropna=dropna)
        if len(self.outputs) == 1:
            return [X], [y]
        j = self.dims.index(self.out_col)
        Xs, ys = [], []
        for i in np.unique(X[:, j]):
            idx = X[:, j] == i
            Xs.append(np.delete(X[idx], j, axis=1))
            ys.append(y[idx])
        return Xs, ys

    def fit_model(self, **kwargs):
        """Optimize hyperparameters of an already-built model (reference
        botorch/GP.py:387-392's ``fit_gpytorch_mll`` step); alias for
        :meth:`find_MAP` so BotorchGP-style call sites port unchanged."""
        return self.find_MAP(**kwargs)

    def build_latent(self, *args, **kwargs):
        """Latent-GP construction (reference GP.py:759-797).

        With a Gaussian likelihood the latent and marginal formulations give
        the identical posterior, so the regressor always uses the (cheaper)
        marginal path; latent modeling is meaningful for non-Gaussian
        likelihoods — use :class:`gumbi_tpu.GPC`, which builds the latent
        model with a Laplace approximation.
        """
        raise NotImplementedError(
            "GP uses the marginal formulation (identical posterior for Gaussian "
            "likelihoods). For latent models with non-Gaussian likelihoods use GPC."
        )

    def find_MAP(
        self, n_restarts=8, maxiter=500, tol=1e-8, seed=None, mesh=None,
        shard_data=False, engine="cholesky", iter_config=None, **kwargs
    ):
        """Learn MAP hyperparameters by multi-restart L-BFGS on device.

        Restart 0 starts from the prior moments (the PyMC starting point);
        the rest jitter in unconstrained space. The best finite optimum wins.

        Passing a :class:`jax.sharding.Mesh` (e.g. from
        :func:`gumbi_tpu.parallel.make_mesh`) shards the restart batch over
        its 'restart'/'data' axes — one fit program, restarts in parallel
        across chips — for the dense Hadamard, Kronecker, and Independent
        structures. With ``shard_data=True`` (dense Hadamard only) the N-axis
        itself shards instead: Gram assembly AND the blocked Cholesky
        distribute over the 'data' axis with O(N²/P) per-device memory
        (:mod:`gumbi_tpu.parallel.blocked`) — the exact-dense large-N path.

        ``engine='iterative'`` (dense Hadamard) swaps the Cholesky marginal
        likelihood for the matrix-free mBCG + stochastic Lanczos engine
        (:mod:`gumbi_tpu.ops.iterative`): O(N·block) memory, all-GEMM
        matvecs — exact dense fits at N = 50k on one chip
        (benchmarks/bench_iterative50k.py: one value+grad 0.23 s at 50k).
        ``iter_config`` takes an :class:`~gumbi_tpu.ops.IterConfig`; the
        default picks a block size for large N automatically. Combined with
        ``mesh=...`` the kernel matvec row-blocks shard over the mesh 'data'
        axis (:mod:`gumbi_tpu.parallel.iterative`): O(N²·R/P) compute and
        O(block·N) memory per device — the multi-chip exact-dense path
        beyond one chip's HBM or latency budget.
        """
        assert self._spec is not None, "Call build_model first"
        seed = self.seed if seed is None else seed
        self._iter_cache = None
        self._iter_state = None

        if engine not in ("cholesky", "iterative"):
            raise ValueError("engine must be 'cholesky' or 'iterative'")
        if engine == "iterative":
            if (
                self.sparse
                or self._structure in ("Kronecker", "Independent")
                or getattr(self, "heteroskedastic_inputs", False)
            ):
                raise NotImplementedError(
                    "engine='iterative' supports the dense Hadamard "
                    "structure (the tall multi-output layout included)."
                )
            return self._find_MAP_iterative(
                iter_config, n_restarts=n_restarts, maxiter=maxiter, tol=tol,
                seed=seed, mesh=mesh,
                coarse_n=kwargs.pop("coarse_n", None),
                polish_maxiter=kwargs.pop("polish_maxiter", None),
            )

        u0s = initial_params(
            self._spec, self._ls_alpha, self._ls_beta, n_restarts=n_restarts, seed=seed,
            dtype=self._dtype,
        )
        ls_alpha = jnp.asarray(self._ls_alpha, dtype=self._dtype)
        ls_beta = jnp.asarray(self._ls_beta, dtype=self._dtype)

        if getattr(self, "heteroskedastic_inputs", False):
            if mesh is not None:
                raise NotImplementedError(
                    "Mesh-sharded fitting is not implemented for "
                    "heteroskedastic_inputs (the noise-GP stage is a small "
                    "second fit; run it on one chip)."
                )
            return self._find_MAP_het(
                u0s, ls_alpha, ls_beta, n_restarts=n_restarts, maxiter=maxiter,
                tol=tol, seed=seed, n_iter=int(kwargs.pop("het_iters", 2)),
            )

        if mesh is not None:
            if self.sparse:
                # Restart-sharded FITC: the O(N·m²) evidence is a pure
                # function of the hyperparameters, so the restart sweep —
                # which dominates sparse fits — spreads over the mesh.
                from ..parallel import sharded_fit_fitc_map

                params, neg_logp, aux = sharded_fit_fitc_map(
                    mesh, self._spec, self._xc, self._xk,
                    self._xu_c, self._xu_k, self._yz,
                    ls_alpha, ls_beta, u0s, maxiter=maxiter, tol=tol,
                    mask=self._mask,
                )
                self._cache = None
                self._params = params
                self._neg_logp = float(neg_logp)
                self._fit_aux = {k: np.asarray(v) for k, v in aux.items()}
                self.MAP = {k: np.asarray(v) for k, v in params.items()}
                return self.MAP
            if self._structure == "Kronecker":
                from ..ops.kronecker import kron_cache
                from ..parallel import sharded_fit_kron_map

                params, neg_logp, aux = sharded_fit_kron_map(
                    mesh, self._spec, self._xc_locs, self._Y,
                    ls_alpha, ls_beta, u0s, maxiter=maxiter, tol=tol,
                )
                self._kron_cache = kron_cache(self._spec, params, self._xc_locs, self._Y)
                self._cache = None
            elif self._structure == "Independent":
                from ..parallel import sharded_fit_gp_map

                self._ind_params = []
                self._ind_caches = []
                neg_logp = 0.0
                aux = {}
                for j, (xc_j, xk_j, y_j) in enumerate(self._ind_data):
                    u0s_j = initial_params(
                        self._spec, self._ls_alpha, self._ls_beta,
                        n_restarts=n_restarts, seed=seed + j, dtype=self._dtype,
                    )
                    p_j, neg_j, aux_j = sharded_fit_gp_map(
                        mesh, self._spec, xc_j, xk_j, y_j,
                        ls_alpha, ls_beta, u0s_j, maxiter=maxiter, tol=tol,
                    )
                    self._ind_params.append(p_j)
                    self._ind_caches.append(posterior_cache(self._spec, p_j, xc_j, xk_j, y_j))
                    neg_logp += float(neg_j)
                    aux[f"output_{j}"] = {k: np.asarray(v) for k, v in aux_j.items()}
                self._params = self._ind_params[0]
                self._neg_logp = neg_logp
                self._fit_aux = aux
                self.MAP = {
                    out: {
                        k: np.asarray(v)
                        for k, v in self._ind_params[self._ind_output_index(out)].items()
                    }
                    for out in self.outputs
                }
                self._cache = None
                return self.MAP
            elif shard_data:
                if self._mask is not None:
                    raise NotImplementedError(
                        "shard_data does not compose with bucket padding (the sharded "
                        "Gram pads to the mesh extent itself)."
                    )
                from ..parallel import data_sharded_fit_gp_map

                params, neg_logp, aux = data_sharded_fit_gp_map(
                    mesh, self._spec, self._xc, self._xk, self._yz,
                    ls_alpha, ls_beta, u0s, maxiter=maxiter, tol=tol,
                )
                # No eager posterior cache: the point of the data-sharded fit
                # is that one device never holds the N×N factorization.
                # Prediction builds it lazily (or shards it via predict(mesh=)).
                self._cache = None
            else:
                from ..parallel import sharded_fit_gp_map

                params, neg_logp, aux = sharded_fit_gp_map(
                    mesh, self._spec, self._xc, self._xk, self._yz,
                    ls_alpha, ls_beta, u0s, maxiter=maxiter, tol=tol,
                    mask=self._mask,
                )
                self._cache = posterior_cache(
                    self._spec, params, self._xc, self._xk, self._yz, mask=self._mask
                )
            self._params = params
            self._neg_logp = float(neg_logp)
            self._fit_aux = {k: np.asarray(v) for k, v in aux.items()}
            self.MAP = {k: np.asarray(v) for k, v in params.items()}
            return self.MAP

        if self.sparse:
            from ..ops.fitc import fitc_neg_logp
            from ..ops.optimize import multi_restart_minimize
            from ..ops.priors import constrain

            def objective(uparams):
                return fitc_neg_logp(
                    self._spec, uparams, self._xc, self._xk,
                    self._xu_c, self._xu_k, self._yz, ls_alpha, ls_beta,
                    mask=self._mask,
                )

            u_best, neg_logp, aux = jax.jit(
                lambda u0s: multi_restart_minimize(objective, u0s, maxiter=maxiter, tol=tol)
            )(u0s)
            params = constrain(u_best)
            self._cache = None
        elif self._structure == "Independent":
            # One single-task fit per output; identical spec → one compile.
            self._ind_params = []
            self._ind_caches = []
            neg_total = 0.0
            aux = {}
            for j, (xc_j, xk_j, y_j) in enumerate(self._ind_data):
                u0s_j = initial_params(
                    self._spec, self._ls_alpha, self._ls_beta,
                    n_restarts=n_restarts, seed=seed + j, dtype=self._dtype,
                )
                p_j, neg_j, aux_j = fit_gp_map(
                    self._spec, xc_j, xk_j, y_j, ls_alpha, ls_beta, u0s_j,
                    maxiter=maxiter, tol=tol,
                )
                self._ind_params.append(p_j)
                self._ind_caches.append(posterior_cache(self._spec, p_j, xc_j, xk_j, y_j))
                neg_total += float(neg_j)
                aux[f"output_{j}"] = {k: np.asarray(v) for k, v in aux_j.items()}
            self._params = self._ind_params[0]  # representative (for dtype etc.)
            self._neg_logp = neg_total
            self._fit_aux = aux
            self.MAP = {
                out: {
                    k: np.asarray(v)
                    for k, v in self._ind_params[self._ind_output_index(out)].items()
                }
                for out in self.outputs
            }
            self._cache = None
            return self.MAP
        elif self._structure == "Kronecker":
            from ..ops.kronecker import kron_cache
            from ..ops.optimize import fit_kron_map
            from ..ops.priors import constrain

            # Module-level jitted fit: repeated Kronecker fits (lab loops,
            # cross-validation) reuse one compiled program per (spec, shape)
            # instead of retracing through a fresh jax.jit(lambda) each call.
            u_best, neg_logp, aux = fit_kron_map(
                self._spec, self._xc_locs, self._Y, ls_alpha, ls_beta, u0s,
                maxiter=maxiter, tol=tol,
            )
            params = constrain(u_best)
            self._kron_cache = kron_cache(self._spec, params, self._xc_locs, self._Y)
            self._cache = None
        else:
            params, neg_logp, aux = fit_gp_map(
                self._spec,
                self._xc,
                self._xk,
                self._yz,
                ls_alpha,
                ls_beta,
                u0s,
                maxiter=maxiter,
                tol=tol,
                mask=self._mask,
            )
        self._params = params
        self._neg_logp = float(neg_logp)
        self._fit_aux = {k: np.asarray(v) for k, v in aux.items()}
        self.MAP = {k: np.asarray(v) for k, v in params.items()}
        if not self.sparse and self._structure != "Kronecker":
            self._cache = posterior_cache(
                self._spec, self._params, self._xc, self._xk, self._yz, mask=self._mask
            )
        return self.MAP

    def _find_MAP_iterative(
        self, iter_config, *, n_restarts, maxiter, tol, seed, mesh=None,
        coarse_n=None, polish_maxiter=None,
    ):
        """Dense-Hadamard MAP fit through the mBCG/SLQ engine.

        Data is bucket-padded (via the engine's exact identity-row masking)
        to a multiple of the matvec block, probes are drawn once per fit
        (deterministic objective), and the posterior state is one PCG solve
        plus the rank-k pivoted-Cholesky factor — never an (N, N) array.
        With a ``mesh`` the matvec row-blocks shard over the 'data' axis
        (:mod:`gumbi_tpu.parallel.iterative`); the posterior cache has the
        same contents either way, so prediction is path-independent.

        Large-N fits stage coarse-to-fine: the restart sweep triages
        hyperparameters on a ``coarse_n``-row subsample through the (cheap,
        exact) Cholesky objective, and only the winner polishes at full N
        through the iterative objective — full-N multi-restart would pay
        ``n_restarts`` × the O(N²) matvec cost per optimizer step for basins
        a 4k subsample separates equally well. Staging activates for
        N > 16,384 or whenever ``coarse_n`` is given; ``polish_maxiter``
        bounds the full-N polish (default 100).
        """
        from ..ops.iterative import IterConfig, draw_probes, iter_map_neg_logp
        from ..ops.priors import constrain

        n = int(self._xc.shape[0])
        if iter_config is None:
            # dense matvec while the (N, N) Gram fits comfortably; blocked
            # streaming beyond that. LOVE rank scales to the data: at large N
            # with data-dense regions the posterior variance needs the Lanczos
            # factor to capture ~512 dominant directions (measured at
            # N=16,384: rank 64 → 860× median over-estimate, rank 512 → 0.6%
            # median error, plateau beyond — benchmarks/README.md).
            iter_config = IterConfig(
                block=0 if n <= 16384 else 2048,
                love_rank=min(512, n),
            )
        cfg = iter_config

        xc, xk, yz, mask = self._xc, self._xk, self._yz, self._mask
        if mesh is not None:
            from ..parallel.iterative import pad_for_dist_iter

            xc, xk, yz, mask = pad_for_dist_iter(mesh, cfg, xc, xk, yz, mask)
        elif cfg.block > 0 and n % cfg.block:
            pad = (-n) % cfg.block
            xc = jnp.concatenate([xc, jnp.zeros((pad, xc.shape[1]), xc.dtype)])
            xk = jnp.concatenate(
                [xk, jnp.zeros((pad, xk.shape[1]), xk.dtype)]
            )
            yz = jnp.concatenate([yz, jnp.zeros((pad,), yz.dtype)])
            base = self._mask if self._mask is not None else jnp.ones((n,), yz.dtype)
            mask = jnp.concatenate([base, jnp.zeros((pad,), yz.dtype)])

        u0s = initial_params(
            self._spec, self._ls_alpha, self._ls_beta, n_restarts=n_restarts,
            seed=seed, dtype=self._dtype,
        )
        ls_alpha = jnp.asarray(self._ls_alpha, dtype=self._dtype)
        ls_beta = jnp.asarray(self._ls_beta, dtype=self._dtype)
        pn, pk = draw_probes(seed, int(xc.shape[0]), cfg, dtype=self._dtype)

        if mesh is not None:
            from ..parallel.iterative import dist_iter_fit_gp_map

            params, neg_logp, aux = dist_iter_fit_gp_map(
                mesh, self._spec, cfg, xc, xk, yz, ls_alpha, ls_beta, u0s,
                pn, pk, mask, maxiter=maxiter, tol=tol,
            )
            self._params = params
            self._neg_logp = float(neg_logp)
            self._fit_aux = {k: np.asarray(v) for k, v in aux.items()}
            self.MAP = {k: np.asarray(v) for k, v in params.items()}
            self._cache = None
            self._iter_state = {"cfg": cfg, "xc": xc, "xk": xk, "yz": yz, "mask": mask}
            from ..parallel.iterative import dist_iter_posterior_cache

            self._iter_cache = dist_iter_posterior_cache(
                mesh, self._spec, cfg, params, xc, xk, yz, mask
            )
            return self.MAP

        def objective_for(cfg_):
            def objective(uparams):
                return iter_map_neg_logp(
                    self._spec, uparams, xc, xk, yz, ls_alpha, ls_beta,
                    pn, pk, cfg_, mask=mask,
                )

            return objective

        staged = coarse_n is not None or n > 16384
        if staged:
            from ..ops.iterative import iter_map_value, iter_map_value_and_grad
            from ..ops.optimize import (
                coarse_restart_map,
                lbfgs_host_minimize,
                multi_restart_minimize_hostloop,
            )

            cn = min(int(coarse_n) if coarse_n else 4096, n)
            rng = np.random.default_rng(seed)
            if self._mask is not None:
                real = np.flatnonzero(np.asarray(self._mask) > 0)
            else:
                real = np.arange(n)
            idx = jnp.asarray(rng.choice(real, size=min(cn, real.size), replace=False))
            xc_c, xk_c, y_c = self._xc[idx], self._xk[idx], self._yz[idx]

            # Host-loop restarts, NOT the vmapped program: on the remote TPU
            # service the batched L-BFGS-of-Cholesky program is re-processed
            # for minutes per fresh process (and has wedged the service
            # outright — bench.py COARSE_MODE, docs/perf.md §9); one
            # single-restart program + async dispatches is equivalent and
            # loads in seconds. The runner is the MODULE-LEVEL jit so repeat
            # fits at the same shapes reuse its executable.
            from ..utils.profiling import phase

            spec = self._spec

            def coarse_runner(u0):
                return coarse_restart_map(
                    spec, xc_c, xk_c, y_c, ls_alpha, ls_beta, u0,
                    maxiter=maxiter, tol=tol,
                )

            with phase("iter_coarse"):
                u_start, _, aux_c = multi_restart_minimize_hostloop(
                    None, u0s, runner=coarse_runner
                )
            pm_iter = int(polish_maxiter) if polish_maxiter else 100
            # Host-driven polish: one jitted value/value+grad per dispatch.
            # A compiled L-BFGS step (value+grad + backtracking trials in ONE
            # program) runs minutes at an ill-conditioned full-N start and
            # crashes the remote TPU worker; single evaluations pass
            # (bisected — docs/perf.md decision 14).
            with phase("iter_polish"):
                # The unconverged-solve guard (ops/iterative.py) returns +inf
                # when CG exits at maxiter above tolerance — correct against
                # garbage steps mid-search, but at the COARSE WINNER itself it
                # would brick the polish (L-BFGS can't start from f=inf and
                # the fit would silently return the subsample optimum).
                # Recovery ladder, cheapest first:
                #   1. the coarse winner at the configured CG cap;
                #   2. up to two RUNNER-UP coarse candidates at the same cap
                #      (a degenerate winner — e.g. collapsed noise on the
                #      subsample — is usually specific to one basin; a
                #      candidate a few nats behind is well-conditioned);
                #   3. the winner at ×4-escalated caps, ceilinged at 2048
                #      (env GUMBI_TPU_POLISH_CG_CAP): cfg.maxiter is an
                #      early-exit cap so raising it costs nothing when solves
                #      converge, but the ceiling is a SERVICE limit — a
                #      4096-iteration CG value+grad at N=50k is a long enough
                #      single program that the remote TPU worker kills it
                #      (docs/perf.md decision 14; observed, r5).
                # There is no separate convergence probe: each rung's first
                # value+grad IS the probe (a non-finite start makes
                # lbfgs_host_minimize return (start, inf, 0) after exactly
                # one dispatch), so the common converged path pays zero
                # duplicate full-N evaluations (advisor r4).
                cap_max = int(os.environ.get("GUMBI_TPU_POLISH_CG_CAP", 2048))
                fs_c = np.asarray(aux_c["all_values"], dtype=np.float64)
                order = np.argsort(np.where(np.isfinite(fs_c), fs_c, np.inf))

                def cand(i):
                    return jax.tree_util.tree_map(
                        lambda a: a[int(i)], aux_c["all_xs"]
                    )

                ladder = [(int(order[k]), cfg)
                          for k in range(min(3, order.size))]
                c = cfg
                while c.maxiter < cap_max:
                    # max(·, 1): maxiter ≤ 0 would pin min(0·4, cap) at 0
                    # and loop forever
                    nxt = min(max(c.maxiter, 1) * 4, cap_max)
                    if nxt <= c.maxiter:
                        break
                    c = dataclasses.replace(c, maxiter=nxt)
                    ladder.append((int(order[0]), c))
                cfg_p = cfg
                start_restart = int(order[0])

                def evals_for(cfg_):
                    # module-level jits (ops/iterative.py): executables are
                    # reused across fits at the same shapes
                    vg = lambda u: iter_map_value_and_grad(  # noqa: E731
                        spec, cfg_, u, xc, xk, yz, ls_alpha, ls_beta, pn, pk,
                        mask=mask,
                    )
                    v = lambda u: iter_map_value(  # noqa: E731
                        spec, cfg_, u, xc, xk, yz, ls_alpha, ls_beta, pn, pk,
                        mask=mask,
                    )
                    return vg, v

                for rung, (ridx, cfg_try) in enumerate(ladder):
                    u_try = cand(ridx)
                    vg_fun, v_fun = evals_for(cfg_try)
                    u_best, neg_logp, polish_iters = lbfgs_host_minimize(
                        objective_for(cfg_try), u_try, maxiter=pm_iter, ftol=tol,
                        vg_fun=vg_fun, v_fun=v_fun,
                    )
                    if np.isfinite(float(neg_logp)):
                        cfg_p, start_restart = cfg_try, ridx
                        break
                    nxt = ladder[rung + 1] if rung + 1 < len(ladder) else None
                    which = (
                        "the coarse-stage optimum" if ridx == int(order[0])
                        else f"coarse candidate {ridx}"
                    )
                    if nxt is None:
                        pass
                    elif nxt[1].maxiter != cfg_try.maxiter:
                        warnings.warn(
                            f"Iterative MLL did not converge at {which} "
                            f"within maxiter={cfg_try.maxiter} CG "
                            f"iterations; escalating the cap to "
                            f"{nxt[1].maxiter} for the full-N polish."
                        )
                    else:
                        warnings.warn(
                            f"Iterative MLL did not converge at {which} "
                            f"within maxiter={cfg_try.maxiter} CG "
                            "iterations; trying the next coarse candidate."
                        )
                u_start = cand(start_restart)
                if not np.isfinite(float(neg_logp)) or int(polish_iters) == 0:
                    warnings.warn(
                        "Full-N polish could not improve on the coarse-stage "
                        "optimum (objective "
                        + ("never evaluated finite" if not np.isfinite(float(neg_logp))
                           else "converged immediately")
                        + "); the fit keeps the "
                        f"subsample ({int(idx.shape[0])}-point) MAP."
                    )
                polish_fallback = not np.isfinite(float(neg_logp))
                if polish_fallback:
                    # The stored value is the COARSE-SUBSAMPLE Cholesky
                    # objective, not the full-N iterative one — flagged in
                    # _fit_aux so it is never mistaken for a full-N number.
                    u_best, neg_logp = u_start, aux_c["all_values"].min()
                cfg = cfg_p
            aux = {
                "all_values": aux_c["all_values"],
                "iters": aux_c["iters"],
                "best_restart": aux_c["best_restart"],
                "polish_iters": polish_iters,
                "polish_fallback": np.asarray(polish_fallback),
                "polish_start_restart": np.asarray(start_restart),
            }
        else:
            from ..ops.iterative import fit_iter_map

            u_best, neg_logp, aux = fit_iter_map(
                self._spec, cfg, xc, xk, yz, ls_alpha, ls_beta, pn, pk, u0s,
                mask=mask, maxiter=maxiter, tol=tol,
            )
        params = constrain(u_best)
        self._params = params
        self._neg_logp = float(neg_logp)
        self._fit_aux = {k: np.asarray(v) for k, v in aux.items()}
        self.MAP = {k: np.asarray(v) for k, v in params.items()}
        self._cache = None  # never build the (N, N) Cholesky state
        self._iter_state = {"cfg": cfg, "xc": xc, "xk": xk, "yz": yz, "mask": mask}
        from ..ops.iterative import iter_cache_build
        from ..utils.profiling import phase

        with phase("iter_cache"):
            self._iter_cache = iter_cache_build(
                self._spec, cfg, params, xc, xk, yz, mask=mask
            )
            jax.block_until_ready(self._iter_cache)
        return self.MAP

    def _find_MAP_het(
        self, u0s, ls_alpha, ls_beta, *, n_restarts, maxiter, tol, seed, n_iter=2
    ):
        """Most-likely heteroskedastic GP fit (Kersting et al. 2007, ICML).

        Input-dependent noise — NotImplemented in BOTH reference backends
        (ref gumbi/regression/pymc/GP.py:518-519, botorch/GP.py:142-143).

        Alternates (1) a standard MAP fit of the main GP given a fixed
        per-row relative noise variance, and (2) a secondary GP fit to the
        log expected squared residuals z_i = log((y_i − μ_i)² + var_i),
        whose posterior mean supplies the next round's noise shape
        exp(l(x) − l̄). The learnable σ² keeps the global noise scale (the
        shape is normalized to mean 1 in log space), so the homoskedastic
        model is exactly recovered when the noise GP finds no signal. Every
        stage reuses the engine's jitted fit/predict programs — on TPU the
        whole loop is 2·n_iter + 1 compiled-program invocations.
        """
        if n_iter < 1:
            raise ValueError(
                "het_iters must be >= 1: zero alternations would leave no "
                "fitted noise GP (a plain homoskedastic fit is the model "
                "without heteroskedastic_inputs)."
            )
        spec = self._spec
        xc, xk, y = self._xc, self._xk, self._yz
        params, neg_logp, aux = fit_gp_map(
            spec, xc, xk, y, ls_alpha, ls_beta, u0s, maxiter=maxiter, tol=tol
        )
        # Same kernel/coregion structure for the noise surface, its own
        # homoskedastic white noise.
        noise_spec = GPSpec(
            terms=spec.terms, d_cont=spec.d_cont, ard=spec.ard, period=spec.period
        )
        noise_mult = None
        for it in range(n_iter):
            cache = posterior_cache(spec, params, xc, xk, y, noise_mult=noise_mult)
            mu, var = predict_diag(spec, params, cache, xc, xk, with_noise=False)
            # E[(y − f)²] = squared residual + latent posterior variance
            r2 = np.asarray((y - mu) ** 2 + var, dtype=np.float64)
            z = np.log(np.maximum(r2, 1e-12))
            z_m = float(z.mean())
            z_s = float(max(z.std(), 1e-3))
            zt = jnp.asarray((z - z_m) / z_s, dtype=self._dtype)
            u0s_n = initial_params(
                noise_spec, self._ls_alpha, self._ls_beta,
                n_restarts=n_restarts, seed=seed + 7919 + it, dtype=self._dtype,
            )
            nparams, _, _ = fit_gp_map(
                noise_spec, xc, xk, zt, ls_alpha, ls_beta, u0s_n,
                maxiter=maxiter, tol=tol,
            )
            ncache = posterior_cache(noise_spec, nparams, xc, xk, zt)
            g, _ = predict_diag(noise_spec, nparams, ncache, xc, xk, with_noise=False)
            log_noise = z_m + z_s * np.asarray(g, dtype=np.float64)
            lbar = float(log_noise.mean())
            noise_mult = jnp.asarray(np.exp(log_noise - lbar), dtype=self._dtype)
            params, neg_logp, aux = fit_gp_map(
                spec, xc, xk, y, ls_alpha, ls_beta, u0s,
                maxiter=maxiter, tol=tol, noise_mult=noise_mult,
            )
        self._noise_params = nparams
        self._noise_cache = ncache
        self._noise_mult = noise_mult
        self._noise_stats = (z_m, z_s, lbar)
        self._noise_zt = zt  # persisted by save() so load() can rebuild ncache
        self._params = params
        self._neg_logp = float(neg_logp)
        self._fit_aux = {k: np.asarray(v) for k, v in aux.items()}
        self.MAP = {k: np.asarray(v) for k, v in params.items()}
        self._cache = posterior_cache(spec, params, xc, xk, y, noise_mult=noise_mult)
        return self.MAP

    def _het_noise_mult_at(self, xc_new, xk_new):
        """Relative noise variance exp(l(x) − l̄) at new points (het inputs)."""
        noise_spec = GPSpec(
            terms=self._spec.terms, d_cont=self._spec.d_cont,
            ard=self._spec.ard, period=self._spec.period,
        )
        g, _ = predict_diag(
            noise_spec, self._noise_params, self._noise_cache, xc_new, xk_new,
            with_noise=False,
        )
        z_m, z_s, lbar = self._noise_stats
        return jnp.exp(z_m + z_s * g - lbar)

    def _ensure_dense_cache(self):
        """Dense tall-basis factorization, built lazily when a path (BO,
        joint sampling) needs full covariances the Kronecker cache lacks."""
        if self._structure == "Independent":
            # There is no joint tall model: the sub-spec has no output
            # coregion and each output owns its own params/cache. Every
            # Independent-aware path dispatches to self._ind_caches instead.
            raise RuntimeError(
                "Independent structure has no joint dense cache; "
                "use the per-output models (self._ind_params/_ind_caches)."
            )
        if self._cache is None:
            self._cache = posterior_cache(
                self._spec, self._params, self._xc, self._xk, self._yz,
                mask=self._mask, noise_mult=getattr(self, "_noise_mult", None),
            )
        return self._cache

    ################################################################################
    # Prediction
    ################################################################################

    def predict(self, points_array, with_noise=True, additive_level="total", mesh=None, **kwargs):
        """Predict (mean, variance) at a tall dims-ordered points array.

        Passing a :class:`jax.sharding.Mesh` shards the prediction points over
        the mesh's 'data' axis (zero-communication parallel solves).

        ``additive_level`` selects one component of an additive model
        (reference gp_dict naming, ref GP.py:729-754): ``'total'`` (default)
        is the full sum, ``'global'`` the shared continuous term, and a
        categorical dim name that dim's component. Sublevel prediction is a
        capability the reference declares NotImplemented (ref GP.py:841);
        component posteriors solve against the total-kernel factorization and
        carry no observation noise.
        """
        assert self._params is not None, "Model must be fit before predicting"
        if additive_level != "total":
            suffix = self._parse_additive_level(additive_level)
            from ..ops.posterior import predict_diag_level

            xc, xk = self._split_X(np.asarray(points_array))
            mean, var = predict_diag_level(
                self._spec, self._params, self._ensure_dense_cache(), xc, xk, level=suffix
            )
            return np.asarray(mean), np.asarray(var)

        xc, xk = self._split_X(np.asarray(points_array))
        if mesh is not None:
            if self.sparse:
                raise NotImplementedError(
                    "Mesh-sharded prediction supports the dense path (sparse FITC "
                    "prediction is cheap enough for one chip)."
                )
            from ..parallel import sharded_predict_diag

            if self._structure == "Independent":
                xk_np = np.asarray(xk)
                out_colv = xk_np[:, self._ind_out_idx]
                means, vars_ = [], []
                i = 0
                while i < len(out_colv):
                    j = int(out_colv[i])
                    end = i
                    while end < len(out_colv) and out_colv[end] == j:
                        end += 1
                    m, v = sharded_predict_diag(
                        mesh, self._spec, self._ind_params[j], self._ind_caches[j],
                        xc[i:end], self._reduced_xk(xk_np[i:end]),
                        with_noise=with_noise,
                    )
                    means.append(np.asarray(m))
                    vars_.append(np.asarray(v))
                    i = end
                return np.concatenate(means), np.concatenate(vars_)
            cache = self._ensure_dense_cache()
            het = getattr(self, "heteroskedastic_inputs", False) and self._noise_params is not None
            mean, var = sharded_predict_diag(
                mesh, self._spec, self._params, cache, xc, xk,
                with_noise=with_noise and not het,
            )
            if het and with_noise:
                from ..ops.kernels import noise_diag

                var = var + noise_diag(
                    self._spec, self._params, xk, dtype=var.dtype
                ) * self._het_noise_mult_at(xc, xk)
            return np.asarray(mean), np.asarray(var)
        if self.sparse:
            from ..ops.fitc import fitc_predict

            mean, var = fitc_predict(
                self._spec, self._params, self._xc, self._xk,
                self._xu_c, self._xu_k, self._yz, xc, xk, with_noise=with_noise,
                mask=self._mask,
            )
        elif self._structure == "Kronecker":
            mean, var = self._kron_predict_tall(xc, xk, with_noise)
        elif self._structure == "Independent":
            mean, var = self._independent_predict_tall(xc, xk, with_noise)
        elif getattr(self, "_iter_cache", None) is not None:
            # Fit ran through the iterative engine: predict without ever
            # materializing an (N, N) array (mean via the cached PCG solve,
            # variance via the rank-k LOVE factor — conservative, never
            # below the exact posterior variance; Nyström fallback when
            # love_rank=0).
            from ..ops.iterative import iter_predict_diag_jit

            st = self._iter_state
            mean, var = iter_predict_diag_jit(
                self._spec, st["cfg"], self._params, self._iter_cache,
                st["xc"], st["xk"], jnp.asarray(xc, st["xc"].dtype),
                jnp.asarray(xk), with_noise=with_noise, mask=st["mask"],
            )
        else:
            from ..ops.posterior import predict_diag_chunked

            het = getattr(self, "heteroskedastic_inputs", False) and self._noise_params is not None
            mean, var = predict_diag_chunked(
                self._spec, self._params, self._ensure_dense_cache(), xc, xk,
                with_noise=with_noise and not het, chunk=8192,
            )
            if het and with_noise:
                # Predictive noise = (learnable global σ², output-coregion
                # scaled) × the noise GP's location-dependent shape.
                from ..ops.kernels import noise_diag

                var = var + noise_diag(
                    self._spec, self._params, xk, dtype=var.dtype
                ) * self._het_noise_mult_at(xc, xk)
        return np.asarray(mean), np.asarray(var)

    def _independent_predict_tall(self, xc, xk, with_noise):
        """Per-output prediction for tall (per-output block) point arrays."""
        xk_np = np.asarray(xk)
        out_colv = xk_np[:, self._ind_out_idx]
        means, vars_ = [], []
        i = 0
        while i < len(out_colv):
            j = int(out_colv[i])
            end = i
            while end < len(out_colv) and out_colv[end] == j:
                end += 1
            m, v = predict_diag(
                self._spec, self._ind_params[j], self._ind_caches[j],
                xc[i:end], self._reduced_xk(xk_np[i:end]), with_noise=with_noise,
            )
            means.append(m)
            vars_.append(v)
            i = end
        return jnp.concatenate(means), jnp.concatenate(vars_)

    def _kron_predict_tall(self, xc, xk, with_noise):
        """Kronecker prediction for tall (per-output block) point arrays.

        Prediction points arrive as identical location blocks tiled per
        requested output (built by ``_prepare_points_for_prediction``); each
        block is answered from the shared-location Kronecker posterior.
        """
        from ..ops.kronecker import kron_predict_diag

        xk_col = np.asarray(xk[:, 0])
        # Contiguous output blocks in order of appearance
        block_ids = []
        starts = [0]
        for i in range(1, len(xk_col)):
            if xk_col[i] != xk_col[i - 1]:
                starts.append(i)
        starts.append(len(xk_col))
        m = starts[1] - starts[0]
        xc_np = np.asarray(xc)
        for s0, s1 in zip(starts[:-1], starts[1:]):
            assert s1 - s0 == m, "Kronecker prediction requires equal per-output blocks"
            assert np.array_equal(xc_np[s0:s1], xc_np[:m]), (
                "Kronecker prediction requires identical locations per output"
            )
            block_ids.append(int(xk_col[s0]))

        mean_all, var_all = kron_predict_diag(
            self._spec, self._params, self._kron_cache, xc[:m], with_noise=with_noise
        )  # (D, m)
        mean = jnp.concatenate([mean_all[j] for j in block_ids])
        var = jnp.concatenate([var_all[j] for j in block_ids])
        return mean, var

    def output_correlation(self, param_coords) -> np.ndarray:
        """Correlation between outputs from the learned output coregion."""
        W = self._params.get(f"W_{self.out_col}")
        κ = self._params.get(f"κ_{self.out_col}")
        if W is None:
            return np.eye(len(param_coords))
        cor = np.asarray(output_correlation(W, κ))
        sorted_coords = self._cat_maps[self.out_col]
        idx = np.searchsorted(sorted_coords, np.asarray(param_coords, dtype=float))
        return cor[np.ix_(idx, idx)]

    ################################################################################
    # Full-Bayes sampling and posterior draws
    ################################################################################

    def sample(
        self,
        draws=500,
        tune=500,
        chains=None,
        seed=None,
        n_leapfrog=32,
        target_accept=None,
        sampler="chees",
        **kwargs,
    ):
        """Sample the hyperparameter posterior on device.

        Replaces pm.sample (reference GP.py:815-835). ``sampler`` picks the
        kernel:

        * ``'chees'`` (default) — ChEES-HMC: trajectory length LEARNED
          during warmup (cross-chain criterion, halton jitter), step size by
          dual averaging, diagonal mass by Welford. The accelerator-native
          equivalent of the reference's NUTS — same knob-free adaptation,
          but every chain runs the same-length trajectory in one fused XLA
          program instead of NUTS's per-chain recursion (``ops/hmc.py``).
          ``n_leapfrog`` is ignored; chains default to 16 (they batch on
          the MXU nearly for free, and the criterion averages across them).
        * ``'hmc'`` — fixed-trajectory adaptive HMC (``n_leapfrog`` steps);
          chains default to 2.

        Returns (and stores as :attr:`trace`) a dict of natural-space arrays
        with leading (chains, draws) axes, plus ``_stats`` with acceptance
        (and for ChEES, adapted step-size/trajectory) diagnostics.
        """
        from ..ops.hmc import chees_sample, hmc_sample
        from ..ops.priors import constrain, unconstrain

        if sampler not in ("chees", "hmc"):
            raise ValueError(f"sampler must be 'chees' or 'hmc', got {sampler!r}")
        if chains is None:
            chains = 16 if sampler == "chees" else 2

        assert self._spec is not None, "Call build_model first"
        if self._structure == "Independent":
            raise NotImplementedError(
                "Full-Bayes sampling is not implemented for the Independent "
                "structure (the reference's ModelListGP backend is MAP-only, "
                "ref gumbi/regression/botorch/GP.py); use Hadamard for HMC "
                "over a joint multi-output model."
            )
        seed = self.seed if seed is None else seed
        ls_alpha = jnp.asarray(self._ls_alpha, dtype=self._dtype)
        ls_beta = jnp.asarray(self._ls_beta, dtype=self._dtype)

        from ..ops.mll import map_neg_logp

        def logp(uparams):
            # With heteroskedastic inputs the hyperparameter posterior is
            # conditional on the fitted noise shape (the noise GP stays at
            # its MAP — the reference has no analog of this path at all).
            return -map_neg_logp(
                self._spec, uparams, self._xc, self._xk, self._yz, ls_alpha, ls_beta,
                mask=self._mask, noise_mult=getattr(self, "_noise_mult", None),
            )

        if self._params is not None:
            q0 = unconstrain(self._params)
        else:
            from ..ops import initial_params

            u0s = initial_params(self._spec, self._ls_alpha, self._ls_beta, 1, seed, dtype=self._dtype)
            q0 = {k: v[0] for k, v in u0s.items()}

        key = jax.random.PRNGKey(seed)
        if sampler == "chees":
            usamples, stats = chees_sample(
                logp,
                q0,
                key,
                draws=draws,
                tune=tune,
                chains=chains,
                target_accept=0.75 if target_accept is None else float(target_accept),
            )
        else:
            usamples, stats = hmc_sample(
                logp,
                q0,
                key,
                draws=draws,
                tune=tune,
                chains=chains,
                n_leapfrog=n_leapfrog,
                target_accept=0.8 if target_accept is None else float(target_accept),
            )
        natural = constrain(usamples)
        self.trace = {k: np.asarray(v) for k, v in natural.items()}
        self.trace["_stats"] = {k: np.asarray(v) for k, v in stats.items()}
        return self.trace

    def _parse_additive_level(self, additive_level):
        """Validate an ``additive_level`` request; return the term suffix or
        None for 'total'. Shared by predict/draw paths."""
        if additive_level == "total":
            return None
        if not self.additive:
            raise ValueError(
                "additive_level is only meaningful for additive models "
                "(fit with additive=True)."
            )
        if self.sparse or self._structure in ("Kronecker", "Independent"):
            raise NotImplementedError(
                "Sublevel prediction is implemented for the dense additive "
                "model (the structure additive models actually build)."
            )
        suffix = "total" if additive_level == "global" else additive_level
        valid = {"global"} | {t.suffix for t in self._spec.terms if t.suffix != "total"}
        if suffix not in {t.suffix for t in self._spec.terms}:
            raise ValueError(
                f"additive_level {additive_level!r} not among this model's "
                f"components {sorted(valid)}"
            )
        return suffix

    def _store_sample_var(self, var_name, increment_var, value):
        """Reference var-name bookkeeping (GP.py:846-858): store draws under
        ``var_name`` in :attr:`sample_vars`, appending '_' on collision when
        ``increment_var`` is True, raising otherwise."""
        if not hasattr(self, "sample_vars") or self.sample_vars is None:
            self.sample_vars = {}
        while var_name in self.sample_vars:
            if not increment_var:
                raise ValueError(
                    f'The variable name "{var_name}" already exists in model.'
                )
            var_name = var_name + "_"
        self.sample_vars[var_name] = value
        return var_name

    def draw_point_samples(
        self, points, n_samples=1, output=None, with_noise=False, seed=None, source=None,
        additive_level="total", var_name="posterior_samples", increment_var=True,
    ):
        """Joint posterior draws at supplied points, returned as a parray.

        ``source=None`` uses the MAP hyperparameters; passing the dict
        returned by :meth:`sample` integrates over the hyperparameter
        posterior (one function draw per subsampled hyperparameter draw).

        Multiple outputs draw JOINTLY: the tall prediction stack carries the
        output coordinate, so the coregion (ICM) covariance correlates the
        outputs within each draw — a capability the reference declares
        NotImplemented (reference gumbi/regression/pymc/GP.py:898). For the
        ``Independent`` structure, outputs are uncorrelated by construction
        and are drawn from their per-output models (exact by definition).

        ``additive_level`` draws from one component's conditional of an
        additive model (reference GP.py:915-916 draws through
        ``gp_dict[additive_level].conditional``): ``'total'`` (default) is the
        full sum, ``'global'`` the shared continuous term, a categorical dim
        name that dim's component. ``var_name``/``increment_var`` mirror the
        reference's sample bookkeeping (GP.py:846-858): draws are stored in
        ``self.sample_vars[var_name]``, appending ``'_'`` on collision when
        ``increment_var`` (raising otherwise).
        Returns a parray with one layer per output, shape (n_samples, n_points).
        """
        level = self._parse_additive_level(additive_level)
        output = self._parse_prediction_output(output)
        points_array, _, _ = self._prepare_points_for_prediction(points, output=output)
        xc, xk = self._split_X(np.asarray(points_array))
        key = jax.random.PRNGKey(self.seed if seed is None else seed)
        d_out = len(output)
        n_pts = xc.shape[0] // d_out

        if self.sparse:
            # Joint draws through the FITC posterior (consistent with
            # fitc_predict; the reference has no sparse sampling path).
            from ..ops.fitc import fitc_draw_samples

            def _fitc_draws(p, k, n_s):
                return fitc_draw_samples(
                    self._spec, p, self._xc, self._xk, self._xu_c, self._xu_k,
                    self._yz, xc, xk, k, n_samples=n_s, with_noise=with_noise,
                    mask=self._mask,
                )

            if source is None or source is self.MAP:
                out = np.asarray(_fitc_draws(self._params, key, n_samples))
            else:
                trace = {k: v for k, v in source.items() if not k.startswith("_")}
                chains, ndraws = next(iter(trace.values())).shape[:2]
                flat = {k: v.reshape(chains * ndraws, *v.shape[2:]) for k, v in trace.items()}
                rng = np.random.default_rng(self.seed if seed is None else seed)
                idxs = rng.choice(chains * ndraws, n_samples, replace=n_samples > chains * ndraws)
                rows = []
                for i, idx in enumerate(idxs):
                    p = {k: jnp.asarray(v[idx], dtype=self._dtype) for k, v in flat.items()}
                    rows.append(np.asarray(_fitc_draws(p, jax.random.fold_in(key, i), 1))[0])
                out = np.stack(rows)
            out = out.reshape(n_samples, d_out, n_pts)
            self.predictions = self.parray(
                **{name: out[:, i] for i, name in enumerate(output)}, stdzd=True
            )
            self.predictions_X = points
            self._store_sample_var(var_name, increment_var, self.predictions)
            return self.predictions

        if source is None or source is self.MAP:
            if self._structure == "Independent":
                blocks = []
                for i, name in enumerate(output):
                    j = self._ind_output_index(name)
                    sl = slice(i * n_pts, (i + 1) * n_pts)
                    s = draw_samples(
                        self._spec,
                        self._ind_params[j],
                        self._ind_caches[j],
                        xc[sl],
                        self._reduced_xk(np.asarray(xk[sl])),
                        jax.random.fold_in(key, i),
                        n_samples=n_samples,
                        with_noise=with_noise,
                    )
                    blocks.append(np.asarray(s))
                out = np.stack(blocks, axis=1)  # (n_samples, d_out, n_pts)
            else:
                samples = draw_samples(
                    self._spec,
                    self._params,
                    self._ensure_dense_cache(),
                    xc,
                    xk,
                    key,
                    n_samples=n_samples,
                    with_noise=with_noise,
                    level=level,
                )
                out = np.asarray(samples).reshape(n_samples, d_out, n_pts)
        else:
            # Hyperparameter-posterior-integrated draws: subsample the trace
            trace = {k: v for k, v in source.items() if not k.startswith("_")}
            chains, ndraws = next(iter(trace.values())).shape[:2]
            flat = {k: v.reshape(chains * ndraws, *v.shape[2:]) for k, v in trace.items()}
            rng = np.random.default_rng(self.seed if seed is None else seed)
            idxs = rng.choice(chains * ndraws, n_samples, replace=n_samples > chains * ndraws)
            rows = []
            for i, idx in enumerate(idxs):
                p = {k: jnp.asarray(v[idx], dtype=self._dtype) for k, v in flat.items()}
                # Heteroskedastic-input fits sampled the trace conditioned on
                # the fitted noise shape (sample()'s logp passes noise_mult);
                # the per-draw caches must condition on the same likelihood.
                cache_i = posterior_cache(
                    self._spec, p, self._xc, self._xk, self._yz, mask=self._mask,
                    noise_mult=getattr(self, "_noise_mult", None),
                )
                s = draw_samples(
                    self._spec, p, cache_i, xc, xk, jax.random.fold_in(key, i),
                    n_samples=1, with_noise=with_noise, level=level,
                )
                rows.append(np.asarray(s)[0])
            out = np.stack(rows).reshape(n_samples, d_out, n_pts)

        self.predictions = self.parray(
            **{name: out[:, i] for i, name in enumerate(output)}, stdzd=True
        )
        self.predictions_X = points
        self._store_sample_var(var_name, increment_var, self.predictions)
        return self.predictions

    def draw_grid_samples(self, n_samples=1, output=None, categorical_levels=None, **kwargs):
        """Joint posterior draws over the prepared grid, reshaped to the grid."""
        if self.grid_points is None:
            raise ValueError("Grid must first be specified with `prepare_grid`")
        points = self.grid_points
        if self.categorical_dims:
            points = self.append_categorical_points(points, categorical_levels=categorical_levels)
        samples = self.draw_point_samples(points, n_samples=n_samples, output=output, **kwargs)
        self.predictions = samples.reshape(-1, *self.grid_parray.shape)
        self.predictions_X = self.predictions_X.reshape(self.grid_parray.shape)
        return self.predictions

    ################################################################################
    # Bayesian optimization (engine acquisitions; reference
    # gumbi/regression/botorch/GP.py:652-780 used BoTorch qLogNEI/qLogNEHVI)
    ################################################################################

    def propose(
        self,
        target=None,
        acquisition="EI",
        *,
        q=None,
        bounds=None,
        maximize=True,
        num_restarts=10,
        raw_samples=512,
        mc_samples=256,
        seed=None,
        ref_point=None,
        sequential=False,
        max_baseline=64,
        **optim_kwargs,
    ):
        """Propose new experiments.

        Two modes, matching the two reference surfaces:

        * ``propose(target, acquisition='EI'|'PD')`` — grid-based proposal
          toward a target value over existing predictions (Regressor parity).
        * ``propose(q=...)`` — on-device batch Bayesian optimization: smoothed
          qLogNEI (single output), exact-sweep qLogNEHVI (two outputs), or
          decomposition-free QMC-box qLogNEHVI (three or more outputs) over
          Sobol QMC samples, maximized by vmapped multi-restart L-BFGS.
          Returns (candidates parray, acquisition value).
        """
        if q is None:
            return super().propose(target, acquisition=acquisition)

        from ..ops.acquisition import (
            optimize_acqf,
            optimize_qlog_nei,
            qlog_nehvi_2d,
            qlog_nehvi_mc,
            sobol_normal,
            sobol_uniform,
        )

        assert self._params is not None, "Model must be fit before proposing"
        # Materialize the dense cache eagerly: building it lazily inside the
        # traced acquisition closure would leak tracers onto self._cache.
        # Independent structure has no joint cache — its acquisitions sample
        # the block-diagonal model-list posterior via make_indep_sample_fn.
        if self._structure == "Independent":
            from ..ops.acquisition import make_indep_sample_fn

            indep_sample_fn = make_indep_sample_fn(
                self._spec, self._ind_params, self._ind_caches, self._ind_out_idx
            )
        else:
            indep_sample_fn = None
            self._ensure_dense_cache()
        seed = self.seed if seed is None else seed
        d = len(self.continuous_dims)
        d_out = len(self.outputs)

        # Bounds in z-space over the continuous dims. Bucketed fits pad
        # self._xc with zero rows — excluded here, or the search box would
        # stretch to the z-space origin regardless of the data's range.
        xc_train = np.asarray(self._xc)
        n_real_rows = (
            int(np.asarray(self._mask).sum()) if self._mask is not None else xc_train.shape[0]
        )
        if bounds is None:
            # Unique locations (first output block if multi-output)
            lo, hi = xc_train[:n_real_rows].min(0), xc_train[:n_real_rows].max(0)
        else:
            from ..arrays import ParameterArray

            if isinstance(bounds, ParameterArray):
                b = bounds.z.values()
                b = np.atleast_2d(b)
                lo, hi = b[:, 0], b[:, 1]
            else:
                b = np.asarray(bounds, dtype=float)
                if b.shape[0] == 2:  # (2, d)
                    lo, hi = b[0], b[1]
                else:  # (d, 2)
                    lo, hi = b[:, 0], b[:, 1]

        # Baseline: subsample training locations (pruning analog). Bucketed
        # fits carry masked phantom zero-rows at the tail of self._xc; those
        # must never enter the acquisition baseline (they would act as fake
        # observations at the origin and make the joint covariance
        # near-singular), so slice to the real rows first.
        rng = np.random.default_rng(seed)
        n_real = n_real_rows
        if d_out == 1:
            base_locs = xc_train[:n_real]
        else:
            # Tall layout is output-major: the first n_real/d_out rows are
            # the shared locations of output 0. Independent data can be
            # ragged across outputs — use output 0's own block there.
            if self._structure == "Independent":
                base_locs = np.asarray(self._ind_data[0][0])
            else:
                base_locs = xc_train[: n_real // d_out]
        if base_locs.shape[0] > max_baseline:
            idx = rng.choice(base_locs.shape[0], max_baseline, replace=False)
            base_locs = base_locs[idx]
        elif base_locs.shape[0] < max_baseline:
            # Pad to the static ``max_baseline`` size by repeating rows. For
            # the hard-indicator qNEHVI paths duplicates are exactly neutral
            # (dominance structure is unchanged); for qLogNEI's smoothed max
            # (τ·logsumexp) tiling shifts the incumbent by ~τ·log(reps) and
            # truncated tiling weights some rows more than others — a
            # candidate-independent offset, so the *ranking* of candidates is
            # preserved in practice (pinned by
            # test_bo.py::test_qlog_nei_invariant_to_duplicated_baseline).
            # The fixed shape lets a growing lab-loop dataset reuse ONE
            # compiled acquisition program across rounds instead of
            # recompiling at every new baseline size.
            reps = -(-max_baseline // base_locs.shape[0])
            base_locs = np.tile(base_locs, (reps, 1))[:max_baseline]
        nb = base_locs.shape[0]
        xc_base = jnp.asarray(base_locs, dtype=self._dtype)

        out_j = (
            self.categorical_dims.index(self.out_col)
            if self.out_col in self.categorical_dims
            else None
        )
        n_cat = self._xk.shape[1]

        def cat_cols(n_rows, out_idx):
            cols = np.zeros((n_rows, n_cat), dtype=np.int32)
            if out_j is not None:
                cols[:, out_j] = out_idx
            return jnp.asarray(cols)

        def propose_one(q_now, extra_base_c):
            xc_b = jnp.concatenate([xc_base, extra_base_c]) if extra_base_c is not None else xc_base
            nb_now = xc_b.shape[0]
            if d_out == 1:
                P = q_now + nb_now
                base_samples = jnp.asarray(
                    sobol_normal(mc_samples, P, seed=seed), dtype=self._dtype
                )
                xk_c = cat_cols(q_now, 0)
                xk_b = cat_cols(nb_now, 0)

                # Module-level jitted path: with stable shapes (bucketed fit
                # + padded baseline) a fit→propose→refit campaign traces and
                # compiles the acquisition program once, across GP instances.
                raw = sobol_uniform(raw_samples * q_now, len(lo), seed=seed).reshape(
                    raw_samples, q_now, len(lo)
                )
                lo_j = jnp.asarray(lo, dtype=self._dtype)
                hi_j = jnp.asarray(hi, dtype=self._dtype)
                X_raw = jnp.asarray(raw, dtype=self._dtype) * (hi_j - lo_j) + lo_j
                return optimize_qlog_nei(
                    self._spec,
                    self._params,
                    self._ensure_dense_cache(),
                    xk_c,
                    xc_b,
                    xk_b,
                    base_samples,
                    X_raw,
                    lo_j,
                    hi_j,
                    num_restarts=num_restarts,
                    maximize=maximize,
                    **optim_kwargs,
                )
            else:
                # Each location contributes one row per output (output-major)
                P = d_out * (q_now + nb_now)
                base_samples = jnp.asarray(
                    sobol_normal(mc_samples, P, seed=seed), dtype=self._dtype
                )
                xk_bD = jnp.concatenate([cat_cols(nb_now, j) for j in range(d_out)])
                xc_bD = jnp.concatenate([xc_b] * d_out)

                # Reference ref_point default: per-output train min − 1e-3
                if ref_point is None:
                    if self._structure == "Independent":
                        # Ragged-safe: per-output blocks from the sub-model data
                        halves = [np.asarray(y_j) for (_, _, y_j) in self._ind_data]
                    else:
                        # Slice off bucket-padding rows first: the padded
                        # zeros sit at the tail of the tall vector, so an
                        # unmasked split would mix outputs across block
                        # boundaries AND count phantom zeros in the min/max.
                        y = np.asarray(self._yz)[:n_real_rows]
                        halves = np.split(y, d_out)
                    rp = [
                        (h.min() - 1e-3) if maximize else -(h.max() + 1e-3) for h in halves
                    ]
                else:
                    rp = list(ref_point)

                joint_cache = None if indep_sample_fn is not None else self._ensure_dense_cache()
                joint_params = None if indep_sample_fn is not None else self._params
                if d_out == 2:
                    # Exact sweep-line hypervolume (differentiable a.e.)
                    def acq(Xc):
                        xc_cD = jnp.concatenate([Xc] * d_out)
                        xk_cD = jnp.concatenate([cat_cols(q_now, j) for j in range(d_out)])
                        return qlog_nehvi_2d(
                            self._spec, joint_params, joint_cache,
                            xc_cD, xk_cD, xc_bD, xk_bD, base_samples,
                            jnp.asarray(rp, dtype=self._dtype), maximize=maximize,
                            sample_fn=indep_sample_fn,
                        )
                else:
                    # D ≥ 3: decomposition-free QMC box integration
                    # (reference qLogNEHVI parity, ref botorch/GP.py:745-753)
                    u_box = jnp.asarray(
                        sobol_uniform(512, d_out, seed=seed + 1), dtype=self._dtype
                    )

                    def acq(Xc):
                        xc_cD = jnp.concatenate([Xc] * d_out)
                        xk_cD = jnp.concatenate([cat_cols(q_now, j) for j in range(d_out)])
                        return qlog_nehvi_mc(
                            self._spec, joint_params, joint_cache,
                            xc_cD, xk_cD, xc_bD, xk_bD, base_samples,
                            jnp.asarray(rp, dtype=self._dtype), u_box, d_out,
                            maximize=maximize,
                            sample_fn=indep_sample_fn,
                        )

            return optimize_acqf(
                acq,
                (jnp.asarray(lo, dtype=self._dtype), jnp.asarray(hi, dtype=self._dtype)),
                q=q_now,
                num_restarts=num_restarts,
                raw_samples=raw_samples,
                seed=seed,
                dtype=self._dtype,
                **optim_kwargs,
            )

        if sequential and q > 1:
            cands = []
            extra = None
            val = None
            for _ in range(q):
                c, val = propose_one(1, extra)
                cands.append(np.asarray(c))
                extra = jnp.asarray(np.vstack(cands), dtype=self._dtype)
            candidates = np.vstack(cands)
            acq_value = float(val)
        else:
            c, val = propose_one(q, None)
            candidates = np.asarray(c)
            acq_value = float(val)

        cand_parray = self.parray(
            **{dim: candidates[:, i] for i, dim in enumerate(self.continuous_dims)},
            stdzd=True,
        )
        return cand_parray, acq_value

    ################################################################################
    # Gradients — trivial under jax.grad (the reference needed torch autograd,
    # reference gumbi/regression/botorch/GP.py:535-650)
    ################################################################################

    def _mean_fn_single(self, xc_single, xk_single):
        ks = gram(
            self._spec,
            self._params,
            xc_single[None, :],
            xk_single[None, :],
            self._cache.xc,
            self._cache.xk,
        )
        return (ks @ self._cache.alpha)[0]

    def predict_grad(self, points_array, additive_level="total"):
        """Raw z-space posterior-mean gradient at a tall dims-ordered array.

        The lowest of the three gradient entry points (reference
        gumbi/regression/botorch/GP.py:535-577): takes the standardized tall
        points array directly (continuous columns first, categorical coords
        after, as produced by ``_prepare_points_for_prediction``) and returns
        the (M, d_cont) array of ∂mean_z/∂x_z with no unit rescaling.
        ``predict_points_grad`` / ``predict_grid_grad`` build on this and add
        natural-unit partials and norms.
        """
        if additive_level != "total":
            raise NotImplementedError("Prediction for additive sublevels is not yet supported.")
        assert self._params is not None, "Model must be fit before predicting"
        xc, xk = self._split_X(np.asarray(points_array))
        if self._structure == "Independent":
            # Per-output mean gradients against each sub-model's own cache
            # (tall points arrive in contiguous per-output blocks).
            xk_np = np.asarray(xk)
            out_colv = xk_np[:, self._ind_out_idx]
            rows = []
            i = 0
            while i < len(out_colv):
                j = int(out_colv[i])
                end = i
                while end < len(out_colv) and out_colv[end] == j:
                    end += 1
                cache_j, params_j = self._ind_caches[j], self._ind_params[j]

                def mean_one(xc_s, xk_s, params_j=params_j, cache_j=cache_j):
                    ks = gram(
                        self._spec, params_j, xc_s[None, :], xk_s[None, :],
                        cache_j.xc, cache_j.xk,
                    )
                    return (ks @ cache_j.alpha)[0]

                g = jax.vmap(jax.grad(mean_one, argnums=0), in_axes=(0, 0))(
                    xc[i:end], self._reduced_xk(xk_np[i:end])
                )
                rows.append(np.asarray(g))
                i = end
            return np.concatenate(rows, axis=0)
        self._ensure_dense_cache()
        grad_fn = jax.vmap(jax.grad(self._mean_fn_single, argnums=0), in_axes=(0, 0))
        return np.asarray(grad_fn(xc, xk))  # (M, d_cont) in z-space

    def predict_points_grad(self, points, output=None, norm=True):
        """∂(posterior mean)/∂(continuous inputs) at points, in natural units.

        Standardized-space gradients are rescaled per pair by σ_y/σ_x. With
        ``norm=True``, returns per-output gradient norms ``|∇|<output>``.
        """
        output = self._parse_prediction_output(output)
        points_array, tall_points, param_coords = self._prepare_points_for_prediction(
            points, output=output
        )
        dydX = self.predict_grad(np.asarray(points_array))  # (M_total, d_cont) z-space

        partials = {}
        for name in output:
            coord = self.categorical_coords[self.out_col][name] if param_coords else None
            σy = np.sqrt(self.stdzr.get(name, {"σ2": 1})["σ2"])
            if param_coords:
                idx = (tall_points[self.out_col].values() == coord).squeeze()
                rows = dydX[idx]
            else:
                rows = dydX
            for i, x_var in enumerate(self.continuous_dims):
                σx = np.sqrt(self.stdzr.get(x_var, {"σ2": 1})["σ2"])
                partials[f"δ[{name}]/δ[{x_var}]"] = rows[:, i] * σy / σx

        grad = self.parray(**partials)
        if norm:
            grad = self._get_pgrad_norm(grad)
        return grad

    def predict_grid_grad(self, output=None, categorical_levels=None, norm=True):
        """Gradient predictions over the prepared grid."""
        points = self.grid_points
        if self.categorical_dims:
            points = self.append_categorical_points(points, categorical_levels=categorical_levels)
        grad = self.predict_points_grad(points, output=output, norm=norm)
        return grad.reshape(self.grid_parray.shape)

    ################################################################################
    # Checkpointing — the reference has no save/load (SURVEY §5.4); model
    # state here is a small pytree, so persistence is one npz file.
    ################################################################################

    def _jsonable_model_specs(self):
        """model_specs with parray entries (period, ls_bounds) converted to
        z-space dicts so save() round-trips them instead of stringifying.

        ``json.dumps(..., default=str)`` would silently turn a period parray
        into a string, and a later ``cross_validate`` on the loaded model
        (which replays ``build_model(**model_specs)``) would crash on it.
        """
        ms = dict(self.model_specs)
        for key in ("period", "ls_bounds"):
            pa = ms.get(key)
            if pa is not None and hasattr(pa, "names"):
                ms[key] = {
                    "__parray_z__": {
                        name: np.asarray(pa[name].z.values(), dtype=float).tolist()
                        for name in pa.names
                    }
                }
        return ms

    @staticmethod
    def _restore_model_specs(ms, stdzr):
        """Inverse of :meth:`_jsonable_model_specs` (z dicts → parrays)."""
        from ..arrays import ParameterArray

        for key in ("period", "ls_bounds"):
            v = ms.get(key)
            if isinstance(v, dict) and "__parray_z__" in v:
                layers = {
                    name: np.asarray(vals, dtype=float)
                    for name, vals in v["__parray_z__"].items()
                }
                ms[key] = ParameterArray(stdzr=stdzr, stdzd=True, **layers)
        return ms

    def save(self, path):
        """Serialize the fitted model (spec, MAP, data arrays, config) to .npz."""
        import json

        assert self._spec is not None, "Nothing to save; build/fit a model first"
        from dataclasses import asdict

        meta = {
            "spec": asdict(self._spec),
            "outputs": self.outputs,
            "out_col": self.out_col,
            "seed": self.seed,
            "continuous_dims": self.continuous_dims,
            "linear_dims": self.linear_dims,
            "categorical_dims": self.categorical_dims,
            "continuous_levels": self.continuous_levels,
            "categorical_levels": self.categorical_levels,
            "continuous_coords": self.continuous_coords,
            "categorical_coords": self.categorical_coords,
            "filter_dims": self.filter_dims,
            "additive": self.additive,
            "model_specs": self._jsonable_model_specs(),
            "sparse": self.sparse,
            "structure": self._structure,
            "stdzr_moments": {k: v for k, v in self.stdzr.items()},
            "stdzr_log_vars": self.stdzr.log_vars,
            "stdzr_logit_vars": self.stdzr.logit_vars,
        }
        arrays = {
            "xc": np.asarray(self._xc),
            "xk": np.asarray(self._xk),
            "y": np.asarray(self._yz),
            "ls_alpha": np.asarray(self._ls_alpha),
            "ls_beta": np.asarray(self._ls_beta),
        }
        if self._params is not None:
            arrays.update({f"param::{k}": np.asarray(v) for k, v in self._params.items()})
        if self.sparse:
            arrays["xu_c"] = np.asarray(self._xu_c)
            arrays["xu_k"] = np.asarray(self._xu_k)
        if self._structure == "Kronecker":
            arrays["xc_locs"] = np.asarray(self._xc_locs)
            arrays["Y"] = np.asarray(self._Y)
        if self._structure == "Independent" and getattr(self, "_ind_params", None):
            # Per-output sub-model parameters (self._params is only output 0)
            for j, p in enumerate(self._ind_params):
                arrays.update({f"ind{j}::{k}": np.asarray(v) for k, v in p.items()})
        if self._mask is not None:
            arrays["mask"] = np.asarray(self._mask)
        if getattr(self, "_noise_params", None) is not None:
            # Heteroskedastic-input state: noise-GP MAP, its (standardized
            # log-residual) targets for cache rebuild, and the z-stats.
            arrays.update(
                {f"noise::{k}": np.asarray(v) for k, v in self._noise_params.items()}
            )
            arrays["noise_zt"] = np.asarray(self._noise_zt)
            arrays["noise_mult"] = np.asarray(self._noise_mult)
            arrays["noise_stats"] = np.asarray(self._noise_stats, dtype=np.float64)
        np.savez(path, __meta__=json.dumps(meta, default=str), **arrays)

    @classmethod
    def load(cls, path, dataset: DataSet):
        """Rebuild a fitted GP from :meth:`save` output plus its DataSet."""
        import json

        from ..ops import CoregTerm, GPSpec, GPTerm

        with np.load(path, allow_pickle=False) as z:
            meta = json.loads(str(z["__meta__"]))
            arrays = {k: z[k] for k in z.files if k != "__meta__"}

        gp = cls(dataset, outputs=meta["outputs"], seed=meta["seed"])
        for attr in (
            "continuous_dims",
            "linear_dims",
            "categorical_dims",
            "continuous_levels",
            "categorical_levels",
            "continuous_coords",
            "categorical_coords",
            "filter_dims",
            "additive",
            "model_specs",
            "sparse",
        ):
            setattr(gp, attr, meta[attr])
        gp.model_specs = cls._restore_model_specs(gp.model_specs, gp.stdzr)

        sd = meta["spec"]
        terms = tuple(
            GPTerm(
                suffix=t["suffix"],
                kernel=t["kernel"],
                linear_idx=tuple(t["linear_idx"]),
                coregs=tuple(CoregTerm(**cg) for cg in t["coregs"]),
            )
            for t in sd["terms"]
        )
        noise_coreg = CoregTerm(**sd["noise_coreg"]) if sd["noise_coreg"] else None
        gp._spec = GPSpec(
            terms=terms,
            d_cont=sd["d_cont"],
            ard=sd["ard"],
            noise_coreg=noise_coreg,
            period=tuple(sd["period"]) if sd["period"] else None,
            # The classifier's spec carries likelihood='bernoulli' (no σ);
            # dropping it on load silently rebuilt a Gaussian spec whose
            # noise_diag KeyErrors on the classifier's parameter set.
            likelihood=sd.get("likelihood", "gaussian"),
        )
        gp.model = gp._spec
        if gp._spec.likelihood == "bernoulli":
            gp.latent = True
            gp._cache = None

        gp._xc = jnp.asarray(arrays["xc"], dtype=gp._dtype)
        gp._xk = jnp.asarray(arrays["xk"], dtype=jnp.int32)
        gp._yz = jnp.asarray(arrays["y"], dtype=gp._dtype)
        gp._ls_alpha = arrays["ls_alpha"]
        gp._ls_beta = arrays["ls_beta"]
        gp._build_cat_maps()
        if gp.sparse:
            gp._xu_c = jnp.asarray(arrays["xu_c"], dtype=gp._dtype)
            gp._xu_k = jnp.asarray(arrays["xu_k"], dtype=jnp.int32)

        params = {
            k[len("param::"):]: jnp.asarray(v, dtype=(jnp.int32 if v.dtype.kind == "i" else gp._dtype))
            for k, v in arrays.items()
            if k.startswith("param::")
        }
        gp._structure = meta.get("structure", "Hadamard")
        if "mask" in arrays:
            gp._mask = jnp.asarray(arrays["mask"], dtype=gp._dtype)
        if gp._structure == "Kronecker":
            gp._xc_locs = jnp.asarray(arrays["xc_locs"], dtype=gp._dtype)
            gp._Y = jnp.asarray(arrays["Y"], dtype=gp._dtype)
        if gp._structure == "Independent":
            gp._split_ind_data()
            gp._ind_params = []
            gp._ind_caches = []
            j = 0
            while any(k.startswith(f"ind{j}::") for k in arrays):
                p_j = {
                    k[len(f"ind{j}::"):]: jnp.asarray(
                        v, dtype=(jnp.int32 if v.dtype.kind == "i" else gp._dtype)
                    )
                    for k, v in arrays.items()
                    if k.startswith(f"ind{j}::")
                }
                xc_j, xk_j, y_j = gp._ind_data[j]
                gp._ind_params.append(p_j)
                gp._ind_caches.append(posterior_cache(gp._spec, p_j, xc_j, xk_j, y_j))
                j += 1
            if gp._ind_params:
                gp._params = gp._ind_params[0]
                gp.MAP = {
                    out: {
                        k: np.asarray(v)
                        for k, v in gp._ind_params[gp._ind_output_index(out)].items()
                    }
                    for out in gp.outputs
                }
            return gp
        # Heteroskedastic-input state (noise GP over log residuals)
        gp.heteroskedastic_inputs = bool(
            (gp.model_specs or {}).get("heteroskedastic_inputs", False)
        )
        if "noise_zt" in arrays:
            gp._noise_params = {
                k[len("noise::"):]: jnp.asarray(
                    v, dtype=(jnp.int32 if v.dtype.kind == "i" else gp._dtype)
                )
                for k, v in arrays.items()
                if k.startswith("noise::")
            }
            gp._noise_zt = jnp.asarray(arrays["noise_zt"], dtype=gp._dtype)
            gp._noise_mult = jnp.asarray(arrays["noise_mult"], dtype=gp._dtype)
            gp._noise_stats = tuple(float(v) for v in arrays["noise_stats"])
            noise_spec = GPSpec(
                terms=gp._spec.terms, d_cont=gp._spec.d_cont,
                ard=gp._spec.ard, period=gp._spec.period,
            )
            gp._noise_cache = posterior_cache(
                noise_spec, gp._noise_params, gp._xc, gp._xk, gp._noise_zt
            )

        if params:
            gp._params = params
            gp.MAP = {k: np.asarray(v) for k, v in params.items()}
            if gp._spec.likelihood == "bernoulli":
                pass  # classifier predicts through laplace_predict, no Gaussian cache
            elif gp._structure == "Kronecker":
                from ..ops.kronecker import kron_cache

                gp._kron_cache = kron_cache(gp._spec, gp._params, gp._xc_locs, gp._Y)
            elif not gp.sparse:
                gp._cache = posterior_cache(
                    gp._spec, gp._params, gp._xc, gp._xk, gp._yz, mask=gp._mask,
                    noise_mult=getattr(gp, "_noise_mult", None),
                )
        return gp

    @staticmethod
    def _get_pgrad_norm(pgrad):
        from ..arrays import ParameterArray
        from ..utils import group_by

        def get_output_name(partial_name):
            return partial_name.split("/")[0].removeprefix("δ[").removesuffix("]")

        by_output = group_by(pgrad.names, get_output_name)
        norms = {}
        for out_name, partial_names in by_output.items():
            partials = np.stack([pgrad[p].values() for p in partial_names], axis=-1)
            norms[f"|∇|{out_name}"] = np.sqrt(np.sum(np.square(partials), axis=-1))
        return ParameterArray(**norms, stdzr=pgrad.stdzr)
