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
from ..ops.optimize import multi_restart_minimize
from ..ops.priors import constrain
from ..ops.mll import map_neg_logp

__all__ = ["sharded_fit_gp_map", "sharded_gram_mll", "sharded_predict_diag", "train_step"]


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
):
    """Multi-restart MAP fit with restarts sharded over the 'restart' axis.

    Data is replicated; the restart batch axis of ``u0s`` is sharded. XLA
    partitions the vmapped L-BFGS across devices and the final argmin induces
    a cheap cross-device reduction.
    """
    restart_sharding = NamedSharding(mesh, P(("restart", "data")))
    rep = NamedSharding(mesh, P())

    # Pad the restart batch to a device-count multiple (duplicates of restart
    # 0 are harmless — the argmin dedupes) so any R shards cleanly.
    n_dev = mesh.devices.size
    R = jax.tree_util.tree_leaves(u0s)[0].shape[0]
    pad = (-R) % n_dev
    if pad:
        u0s = jax.tree_util.tree_map(
            lambda a: jnp.concatenate([a] + [a[:1]] * pad, axis=0), u0s
        )

    u0s = jax.tree_util.tree_map(lambda a: jax.device_put(a, restart_sharding), u0s)
    xc, xk, y, ls_alpha, ls_beta = (
        jax.device_put(v, rep) for v in (xc, xk, y, ls_alpha, ls_beta)
    )

    @partial(jax.jit, static_argnums=(0,), static_argnames=("maxiter",))
    def run(spec, xc, xk, y, ls_alpha, ls_beta, u0s, maxiter=250, tol=1e-6):
        def objective(uparams):
            return map_neg_logp(spec, uparams, xc, xk, y, ls_alpha, ls_beta)

        u_best, f_best, aux = multi_restart_minimize(objective, u0s, maxiter=maxiter, tol=tol)
        return constrain(u_best), f_best, aux

    with jax.set_mesh(mesh) if hasattr(jax, "set_mesh") else mesh:
        return run(spec, xc, xk, y, ls_alpha, ls_beta, u0s, maxiter=maxiter, tol=tol)


def sharded_gram_mll(mesh: Mesh, spec: GPSpec, params, xc, xk, y, jitter=DEFAULT_JITTER):
    """MLL with the Gram row-blocks built in parallel over the 'data' axis.

    Each device computes K[local_rows, :] (its shard of the O(N²·d) assembly),
    an all_gather over ICI assembles K, and the Cholesky runs replicated.
    """
    n_data = mesh.shape["data"]
    n = y.shape[0]
    pad = (-n) % n_data

    xc_p = jnp.pad(xc, ((0, pad), (0, 0)))
    xk_p = jnp.pad(xk, ((0, pad), (0, 0)))

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P("data", None), P("data", None), P(None, None), P(None, None)),
        out_specs=P(None, None),
        check_vma=False,  # all_gather(tiled) output is replicated over 'data'
    )
    def row_blocks(params, xc_rows, xk_rows, xc_all, xk_all):
        K_local = gram(spec, params, xc_rows, xk_rows, xc_all, xk_all)
        return jax.lax.all_gather(K_local, "data", axis=0, tiled=True)

    K = row_blocks(params, xc_p, xk_p, xc_p, xk_p)[:n, :n]
    d = noise_diag(spec, params, xk, dtype=K.dtype) + jitter
    L = jnp.linalg.cholesky(K + jnp.diag(d))
    alpha = jsl.solve_triangular(L, y, lower=True)
    return (
        -0.5 * jnp.sum(alpha**2)
        - jnp.sum(jnp.log(jnp.diag(L)))
        - 0.5 * n * jnp.log(2.0 * jnp.pi)
    )


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

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(), P("data", None), P("data", None)),
        out_specs=(P("data"), P("data")),
    )
    def block(params, L, alpha, xc, xk, xc_blk, xk_blk):
        Ks = gram(spec, params, xc_blk, xk_blk, xc, xk)
        mean = Ks @ alpha
        V = jsl.solve_triangular(L, Ks.T, lower=True)
        var = gram_diag(spec, params, xc_blk, xk_blk) - jnp.sum(V * V, axis=0)
        var = jnp.maximum(var, 0.0)
        if with_noise:
            var = var + noise_diag(spec, params, xk_blk, dtype=var.dtype)
        return mean, var

    mean, var = block(params, cache.L, cache.alpha, cache.xc, cache.xk, xc_p, xk_p)
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
