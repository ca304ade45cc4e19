"""Sharded GP computations over a device mesh.

Three multi-chip patterns (each a direct analog of a transformer-world
parallelism, mapped onto GP workloads):

* **Restart parallelism** ('restart' axis, DP analog): the vmapped
  multi-restart L-BFGS fit shards its restart batch across devices — one jit,
  R/devices restarts per chip, argmin reduction at the end.
* **Data-sharded Gram assembly** ('data' axis, TP analog): each device builds
  its row-block K[local, :] of the N×N Gram; an all-gather over ICI assembles
  the full matrix for the (replicated) Cholesky. Gram assembly is the O(N²·d)
  MXU-bound phase, so sharding it gives near-linear speedup until the
  Cholesky dominates.
* **Sharded grid prediction** ('data' axis): prediction points shard across
  devices; each chip runs its own cross-Gram + triangular solve block with no
  communication at all (embarrassingly parallel).
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
import jax.scipy.linalg as jsl
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
try:
    from jax import shard_map  # JAX ≥ 0.7 public API
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from ..ops.kernels import GPSpec, gram, gram_diag, noise_diag
from ..ops.mll import DEFAULT_JITTER
from ..ops.optimize import lbfgs_backtracking_minimize, multi_restart_minimize
from ..ops.priors import constrain, log_prior
from ..ops.mll import map_neg_logp
from .blocked import dist_quad_and_logdet

__all__ = [
    "sharded_fit_gp_map",
    "sharded_fit_kron_map",
    "sharded_fit_laplace_map",
    "sharded_fit_fitc_map",
    "sharded_fit_fitc_laplace_map",
    "sharded_gram_mll",
    "sharded_predict_diag",
    "data_sharded_fit_gp_map",
    "train_step",
]


def _pad_restarts(u0s, n_dev):
    """Pad the restart batch to a device-count multiple (duplicates of
    restart 0 are harmless — the argmin dedupes)."""
    R = jax.tree_util.tree_leaves(u0s)[0].shape[0]
    pad = (-R) % n_dev
    if pad:
        u0s = jax.tree_util.tree_map(
            lambda a: jnp.concatenate([a] + [a[:1]] * pad, axis=0), u0s
        )
    return u0s


# --- Restart-parallel fits -----------------------------------------------
#
# Every MAP objective in ops/ is a pure function of the unconstrained
# parameter pytree with the data closed over, so restart parallelism is one
# pattern: shard the restart batch over ('restart', 'data'), replicate the
# data, argmin across devices. The adapters below give each objective a
# uniform (spec, uparams, *arrays, mask) calling convention; they are
# module-level functions so the jitted runner's static argument hashes — and
# therefore its compile cache — are stable across calls.


def _dense_obj(spec, u, xc, xk, y, la, lb, mask):
    return map_neg_logp(spec, u, xc, xk, y, la, lb, mask=mask)


def _kron_obj(spec, u, xc_locs, Y, la, lb, mask):
    from ..ops.kronecker import kron_neg_logp

    return kron_neg_logp(spec, u, xc_locs, Y, la, lb)


def _laplace_obj(spec, u, xc, xk, y, la, lb, mask):
    from ..ops.laplace import laplace_neg_logp

    return laplace_neg_logp(spec, u, xc, xk, y, la, lb, mask=mask)


def _fitc_obj(spec, u, xc, xk, xu_c, xu_k, y, la, lb, mask):
    from ..ops.fitc import fitc_neg_logp

    return fitc_neg_logp(spec, u, xc, xk, xu_c, xu_k, y, la, lb, mask=mask)


def _fitc_laplace_obj(spec, u, xc, xk, xu_c, xu_k, y, la, lb, mask):
    from ..ops.fitc_laplace import fitc_laplace_neg_logp

    return fitc_laplace_neg_logp(spec, u, xc, xk, xu_c, xu_k, y, la, lb, mask=mask)


@partial(jax.jit, static_argnums=(0, 1), static_argnames=("maxiter",))
def _run_restart_fit(neg_logp_fn, spec, u0s, arrays, mask, maxiter=250, tol=1e-6):
    def objective(uparams):
        return neg_logp_fn(spec, uparams, *arrays, mask)

    u_best, f_best, aux = multi_restart_minimize(objective, u0s, maxiter=maxiter, tol=tol)
    return constrain(u_best), f_best, aux


def _restart_sharded_fit(mesh, neg_logp_fn, spec, arrays, u0s, mask, maxiter, tol):
    """Shard the restart batch over the mesh, replicate the data, fit."""
    restart_sharding = NamedSharding(mesh, P(("restart", "data")))
    rep = NamedSharding(mesh, P())

    u0s = _pad_restarts(u0s, mesh.devices.size)
    u0s = jax.tree_util.tree_map(lambda a: jax.device_put(a, restart_sharding), u0s)
    arrays = tuple(jax.device_put(v, rep) for v in arrays)
    if mask is not None:
        mask = jax.device_put(jnp.asarray(mask, dtype=arrays[-1].dtype), rep)

    with jax.set_mesh(mesh) if hasattr(jax, "set_mesh") else mesh:
        return _run_restart_fit(
            neg_logp_fn, spec, u0s, arrays, mask, maxiter=maxiter, tol=tol
        )


def sharded_fit_gp_map(
    mesh: Mesh,
    spec: GPSpec,
    xc,
    xk,
    y,
    ls_alpha,
    ls_beta,
    u0s,
    maxiter=250,
    tol=1e-6,
    mask=None,
):
    """Multi-restart MAP fit with restarts sharded over the 'restart' axis.

    Data is replicated; the restart batch axis of ``u0s`` is sharded. XLA
    partitions the vmapped L-BFGS across devices and the final argmin induces
    a cheap cross-device reduction. ``mask`` (0/1 per row) carries bucket
    padding through to the masked MLL, matching the single-device
    ``fit_gp_map`` semantics exactly.
    """
    if mask is not None:
        mask = jnp.asarray(mask, dtype=y.dtype)
    return _restart_sharded_fit(
        mesh, _dense_obj, spec, (xc, xk, y, ls_alpha, ls_beta), u0s, mask,
        maxiter, tol,
    )


def sharded_fit_kron_map(
    mesh: Mesh,
    spec: GPSpec,
    xc_locs,
    Y,
    ls_alpha,
    ls_beta,
    u0s,
    maxiter=250,
    tol=1e-6,
):
    """Restart-sharded MAP fit of the Kronecker-structured LMC model.

    The flagship multi-output structure (batched (D, N, N) Cholesky instead
    of one (ND, ND)): the objective is already a pure function of the
    unconstrained parameters, so restart parallelism is identical to the
    dense path — shard the restart batch, replicate the (N, d)+(N, D) data,
    argmin across devices.
    """
    return _restart_sharded_fit(
        mesh, _kron_obj, spec, (xc_locs, Y, ls_alpha, ls_beta), u0s, None,
        maxiter, tol,
    )


def sharded_fit_laplace_map(
    mesh: Mesh,
    spec: GPSpec,
    xc,
    xk,
    y,
    ls_alpha,
    ls_beta,
    u0s,
    maxiter=300,
    tol=1e-6,
    mask=None,
):
    """Restart-sharded MAP fit of the classifier's Laplace evidence.

    The Laplace marginal likelihood (Newton mode-finding inside jit, exact
    analytic gradient at the mode via the ops/laplace.py custom VJP) is a
    pure function of the unconstrained hyperparameters, so the classifier
    shards restarts exactly like the regressor — GPC.find_MAP(mesh=…).
    """
    if mask is not None:
        mask = jnp.asarray(mask, dtype=y.dtype)
    return _restart_sharded_fit(
        mesh, _laplace_obj, spec, (xc, xk, y, ls_alpha, ls_beta), u0s, mask,
        maxiter, tol,
    )


def sharded_fit_fitc_map(
    mesh: Mesh,
    spec: GPSpec,
    xc,
    xk,
    xu_c,
    xu_k,
    y,
    ls_alpha,
    ls_beta,
    u0s,
    maxiter=250,
    tol=1e-6,
    mask=None,
):
    """Restart-sharded MAP fit of the sparse (FITC) regressor evidence.

    Each restart's objective is O(N·m²) — cheap per step but the restart
    sweep still dominates sparse large-N fits, and it is embarrassingly
    parallel across the mesh: GP.find_MAP(mesh=…) on a sparse build.
    """
    if mask is not None:
        mask = jnp.asarray(mask, dtype=y.dtype)
    return _restart_sharded_fit(
        mesh, _fitc_obj, spec, (xc, xk, xu_c, xu_k, y, ls_alpha, ls_beta),
        u0s, mask, maxiter, tol,
    )


def sharded_fit_fitc_laplace_map(
    mesh: Mesh,
    spec: GPSpec,
    xc,
    xk,
    xu_c,
    xu_k,
    y,
    ls_alpha,
    ls_beta,
    u0s,
    maxiter=300,
    tol=1e-6,
    mask=None,
):
    """Restart-sharded MAP fit of the sparse classifier (FITC-Laplace)."""
    if mask is not None:
        mask = jnp.asarray(mask, dtype=y.dtype)
    return _restart_sharded_fit(
        mesh, _fitc_laplace_obj, spec,
        (xc, xk, xu_c, xu_k, y, ls_alpha, ls_beta), u0s, mask, maxiter, tol,
    )


def _sharded_noisy_gram(mesh: Mesh, spec: GPSpec, params, xc, xk, jitter, n):
    """Row-sharded K + noise·I (+ jitter), padding rows as identity rows.

    Returns (K_rows (Npad, Npad) sharded P('data', None), y-padding mask).
    Each device builds only its (Npad/P, Npad) block — O(N²/P) memory — and
    pad rows become unit-diagonal identity rows contributing zero to the
    quadratic form and log-determinant (same trick as ops.mll bucket padding).
    """
    n_data = mesh.shape["data"]
    pad = (-n) % n_data
    xc_p = jnp.pad(xc, ((0, pad), (0, 0)))
    xk_p = jnp.pad(xk, ((0, pad), (0, 0)))
    mask = jnp.concatenate(
        [jnp.ones(n, dtype=xc.dtype), jnp.zeros(pad, dtype=xc.dtype)]
    )

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(
            P(),
            P("data", None), P("data", None), P("data"),
            P(None, None), P(None, None), P(None),
        ),
        out_specs=P("data", None),
        check_vma=False,
    )
    def rows(params, xc_rows, xk_rows, m_rows, xc_all, xk_all, m_all):
        K = gram(spec, params, xc_rows, xk_rows, xc_all, xk_all)
        K = K * (m_rows[:, None] * m_all[None, :])
        d_local = noise_diag(spec, params, xk_rows, dtype=K.dtype) + jitter
        d_local = m_rows * d_local + (1.0 - m_rows)
        nb = xc_rows.shape[0]
        p = jax.lax.axis_index("data")
        zero = jnp.zeros((), dtype=p.dtype)
        diag_blk = jax.lax.dynamic_slice(K, (zero, p * nb), (nb, nb)) + jnp.diag(d_local)
        return jax.lax.dynamic_update_slice(K, diag_blk, (zero, p * nb))

    return rows(params, xc_p, xk_p, mask, xc_p, xk_p, mask), mask


def sharded_gram_mll(mesh: Mesh, spec: GPSpec, params, xc, xk, y, jitter=DEFAULT_JITTER):
    """MLL with Gram assembly AND factorization sharded over the 'data' axis.

    Each device builds its K[local_rows, :] block (the O(N²·d) assembly) and
    the O(N³) Cholesky runs as the distributed blocked factorization
    (:mod:`gumbi_tpu.parallel.blocked`) — per-device memory O(N²/P), compute
    O(N³/P). Differentiable end-to-end via the distributed custom VJP.
    """
    n = y.shape[0]
    Kn, mask = _sharded_noisy_gram(mesh, spec, params, xc, xk, jitter, n)
    pad = Kn.shape[0] - n
    y_p = jnp.pad(y, (0, pad))
    quad, logdet = dist_quad_and_logdet(mesh, Kn, y_p)
    return -0.5 * (quad + logdet + n * jnp.log(2.0 * jnp.pi))


def data_sharded_fit_gp_map(
    mesh: Mesh,
    spec: GPSpec,
    xc,
    xk,
    y,
    ls_alpha,
    ls_beta,
    u0s,
    maxiter=250,
    tol=1e-6,
    jitter=DEFAULT_JITTER,
):
    """MAP fit where the N-axis (Gram + Cholesky) shards over 'data'.

    The large-N path: a single chip cannot hold the N×N Gram, so every MLL
    (and its analytic-VJP gradient) runs distributed; restarts run
    sequentially (host loop — at these sizes the optimizer step, not the
    restart count, dominates). Returns (params, neg_logp, aux).
    """
    n = y.shape[0]

    def objective(uparams):
        params = constrain(uparams)
        logp = sharded_gram_mll(mesh, spec, params, xc, xk, y, jitter)
        total = logp + log_prior(spec, uparams, ls_alpha, ls_beta)
        return jnp.where(jnp.isfinite(total), -total, jnp.inf)

    run_one = jax.jit(
        lambda u0: lbfgs_backtracking_minimize(objective, u0, maxiter=maxiter, ftol=tol)
    )
    R = jax.tree_util.tree_leaves(u0s)[0].shape[0]
    best = (None, jnp.inf, None)
    all_vals, all_iters = [], []
    for r in range(R):
        u0 = jax.tree_util.tree_map(lambda leaf: leaf[r], u0s)
        x_r, f_r, it_r = run_one(u0)
        all_vals.append(float(f_r))
        all_iters.append(int(it_r))
        # <= so that even if EVERY restart diverges to +inf we still return
        # the (inf-valued) last iterate instead of crashing on constrain(None)
        # — mirroring multi_restart_minimize's graceful argmin-over-inf.
        if best[0] is None or float(f_r) < float(best[1]):
            best = (x_r, f_r, it_r)
    aux = {
        "all_values": jnp.asarray(all_vals),
        "iters": jnp.asarray(all_iters),
        "best_restart": int(np.argmin(all_vals)),
    }
    return constrain(best[0]), best[1], aux


def sharded_predict_diag(mesh: Mesh, spec: GPSpec, params, cache, xc_new, xk_new, with_noise=True):
    """Grid prediction with prediction points sharded over the 'data' axis.

    Zero-communication: every device holds the (replicated) training
    factorization and solves only its block of the grid.
    """
    n_data = mesh.shape["data"]
    m = xc_new.shape[0]
    pad = (-m) % n_data
    xc_p = jnp.pad(xc_new, ((0, pad), (0, 0)))
    xk_p = jnp.pad(xk_new, ((0, pad), (0, 0)))
    # Bucket-padded caches carry identity rows in L; the cross-Gram columns
    # at those rows must be zeroed (same as ops.posterior.predict_diag) or
    # the |V|² term wrongly shrinks the variance.
    mask = cache.mask if cache.mask is not None else jnp.ones(
        cache.xc.shape[0], dtype=cache.L.dtype
    )

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(), P(), P("data", None), P("data", None)),
        out_specs=(P("data"), P("data")),
    )
    def block(params, L, alpha, xc, xk, mask, xc_blk, xk_blk):
        Ks = gram(spec, params, xc_blk, xk_blk, xc, xk)
        Ks = Ks * mask[None, :]
        mean = Ks @ alpha
        V = jsl.solve_triangular(L, Ks.T, lower=True)
        var = gram_diag(spec, params, xc_blk, xk_blk) - jnp.sum(V * V, axis=0)
        var = jnp.maximum(var, 0.0)
        if with_noise:
            var = var + noise_diag(spec, params, xk_blk, dtype=var.dtype)
        return mean, var

    mean, var = block(params, cache.L, cache.alpha, cache.xc, cache.xk, mask, xc_p, xk_p)
    return mean[:m], var[:m]


def train_step(spec: GPSpec, uparams, opt_state, xc, xk, y, ls_alpha, ls_beta, lr=1e-2):
    """One gradient step on the MAP objective (the canonical 'training step').

    Used by the multi-chip dry-run: value+grad of the full MLL+prior under
    whatever shardings the caller installed on ``uparams``/data.
    """
    def loss(u):
        return map_neg_logp(spec, u, xc, xk, y, ls_alpha, ls_beta)

    val, grads = jax.value_and_grad(loss)(uparams)
    new_u = jax.tree_util.tree_map(lambda p, g: p - lr * g, uparams, grads)
    return new_u, opt_state, val
