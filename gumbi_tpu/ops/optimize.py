"""On-device L-BFGS with vmapped multi-restart — the MAP workhorse.

Replaces scipy-loop optimization (pm.find_MAP / fit_gpytorch_mll in the
reference) with a fully jitted L-BFGS (optax, zoom line search) whose restarts
run batched on-device via ``vmap``: one compilation, R restarts in parallel on
the MXU, NaN-robust selection of the best optimum. The same machinery drives
acquisition-function maximization for Bayesian optimization.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import optax

from .kernels import GPSpec
from .mll import DEFAULT_JITTER, map_neg_logp
from .priors import constrain

__all__ = [
    "lbfgs_minimize",
    "multi_restart_minimize",
    "fit_gp_map",
    "fit_kron_map",
    "fit_laplace_map",
]


def _global_norm(tree):
    leaves = jax.tree_util.tree_leaves(tree)
    return jnp.sqrt(sum(jnp.sum(leaf**2) for leaf in leaves))


def lbfgs_minimize(fun, x0, maxiter=250, tol=1e-6, memory_size=16):
    """Minimize ``fun`` (pytree → scalar) from ``x0``; jit- and vmap-safe.

    Returns (x_best, f_best, n_iters). Divergent/NaN steps terminate the loop
    and the best finite iterate seen is returned.
    """
    opt = optax.lbfgs(memory_size=memory_size)
    value_and_grad = optax.value_and_grad_from_state(fun)

    def cond(carry):
        _, _, it, done, _, _ = carry
        return jnp.logical_and(~done, it < maxiter)

    def body(carry):
        x, state, it, _, best_x, best_f = carry
        value, grad = value_and_grad(x, state=state)
        updates, state = opt.update(grad, state, x, value=value, grad=grad, value_fn=fun)
        x_new = optax.apply_updates(x, updates)

        finite = jnp.isfinite(value)
        improved = jnp.logical_and(finite, value < best_f)
        best_x = jax.tree_util.tree_map(
            lambda b, c: jnp.where(improved, c, b), best_x, x
        )
        best_f = jnp.where(improved, value, best_f)

        gnorm = _global_norm(grad)
        done = jnp.logical_or(gnorm < tol, ~finite)
        return x_new, state, it + 1, done, best_x, best_f

    state0 = opt.init(x0)
    f0 = fun(x0)
    init = (x0, state0, jnp.asarray(0), jnp.asarray(False), x0, f0)
    x, _, it, _, best_x, best_f = jax.lax.while_loop(cond, body, init)

    # The final iterate may beat the best recorded mid-loop value.
    f_final = fun(x)
    take_final = jnp.logical_and(jnp.isfinite(f_final), f_final < best_f)
    best_x = jax.tree_util.tree_map(lambda b, c: jnp.where(take_final, c, b), best_x, x)
    best_f = jnp.where(take_final, f_final, best_f)
    return best_x, best_f, it


def lbfgs_backtracking_minimize(fun, x0, maxiter=100, ftol=1e-6, memory_size=16, max_backtracking=20):
    """While-loop L-BFGS with backtracking line search and early stopping.

    The TPU workhorse: unlike the zoom-linesearch path it compiles quickly and
    runs safely inside lax.map, and unlike the fixed-length scan it exits as
    soon as the objective stops moving (relative decrease < ftol — a
    realistic f32 criterion; gradient-norm tolerances stall at f32 precision).

    ``store_grad=False`` (value-only line-search trials) is a measured
    choice: with the analytic-VJP MLLs the gradient costs ~3× the value
    (N=5120: 48 ms vs 15 ms), and store_grad=True linearizes the objective at
    EVERY backtracking trial — 134 ms/iteration observed vs ~80 ms with
    value-only trials plus one explicit value_and_grad per iteration.

    Exception: float64 parameters keep ``store_grad=True``. The value-only
    program miscompiles the TPU backend's emulated-f64 path (XLA memory-space
    assignment assert → compiler SIGABRT, reproduced deterministically on the
    2-output cars fit); the trial-wise-linearized program compiles and runs.
    f64 fits are parity/host paths where compile-safety beats the ~40%
    per-iteration saving.
    """
    x64 = any(
        jnp.result_type(leaf) == jnp.float64
        for leaf in jax.tree_util.tree_leaves(x0)
    )
    opt = optax.lbfgs(
        memory_size=memory_size,
        linesearch=optax.scale_by_backtracking_linesearch(
            max_backtracking_steps=max_backtracking, store_grad=x64
        ),
    )
    if x64:
        vg_state = optax.value_and_grad_from_state(fun)
        value_and_grad = lambda x, state: vg_state(x, state=state)
    else:
        vg_plain = jax.value_and_grad(fun)
        value_and_grad = lambda x, state: vg_plain(x)

    def cond(carry):
        _, _, it, done, _, _, _ = carry
        return jnp.logical_and(~done, it < maxiter)

    def body(carry):
        x, state, it, _, best_x, best_f, v_prev = carry
        value, grad = value_and_grad(x, state)
        updates, state = opt.update(grad, state, x, value=value, grad=grad, value_fn=fun)
        x_new = optax.apply_updates(x, updates)
        finite = jnp.isfinite(value)
        improved = jnp.logical_and(finite, value < best_f)
        best_x = jax.tree_util.tree_map(lambda b, c: jnp.where(improved, c, b), best_x, x)
        best_f = jnp.where(improved, value, best_f)
        done = jnp.logical_or(
            ~finite, jnp.abs(v_prev - value) < ftol * (1.0 + jnp.abs(value))
        )
        return x_new, state, it + 1, done, best_x, best_f, value

    f0 = fun(x0)
    init = (x0, opt.init(x0), jnp.asarray(0), jnp.asarray(False), x0, f0, jnp.inf)
    x, _, it, _, best_x, best_f, _ = jax.lax.while_loop(cond, body, init)
    f_final = fun(x)
    take_final = jnp.logical_and(jnp.isfinite(f_final), f_final < best_f)
    best_x = jax.tree_util.tree_map(lambda b, c: jnp.where(take_final, c, b), best_x, x)
    best_f = jnp.where(take_final, f_final, best_f)
    return best_x, best_f, it


def lbfgs_scan_minimize(fun, x0, maxiter=100, memory_size=16, max_backtracking=20):
    """Fixed-iteration L-BFGS with backtracking line search (scan-based).

    A TPU-robust alternative to :func:`lbfgs_minimize`: the nested
    while(zoom-while) program of the default path triggers TPU worker faults
    at large N on some toolchains, and compiles far slower. This variant uses
    a rolled `lax.scan` of fixed length with an Armijo backtracking search —
    a much smaller program with static control flow. No early exit; the best
    iterate seen is returned.
    """
    opt = optax.lbfgs(
        memory_size=memory_size,
        linesearch=optax.scale_by_backtracking_linesearch(
            max_backtracking_steps=max_backtracking, store_grad=True
        ),
    )
    value_and_grad = optax.value_and_grad_from_state(fun)

    def body(carry, _):
        x, state, best_x, best_f = carry
        value, grad = value_and_grad(x, state=state)
        updates, state = opt.update(grad, state, x, value=value, grad=grad, value_fn=fun)
        x_new = optax.apply_updates(x, updates)
        improved = jnp.logical_and(jnp.isfinite(value), value < best_f)
        best_x = jax.tree_util.tree_map(lambda b, c: jnp.where(improved, c, b), best_x, x)
        best_f = jnp.where(improved, value, best_f)
        return (x_new, state, best_x, best_f), None

    f0 = fun(x0)
    (x, _, best_x, best_f), _ = jax.lax.scan(
        body, (x0, opt.init(x0), x0, f0), None, length=maxiter
    )
    f_final = fun(x)
    take_final = jnp.logical_and(jnp.isfinite(f_final), f_final < best_f)
    best_x = jax.tree_util.tree_map(lambda b, c: jnp.where(take_final, c, b), best_x, x)
    best_f = jnp.where(take_final, f_final, best_f)
    return best_x, best_f, jnp.asarray(maxiter)


def _default_mode():
    """Measured per-backend default; both modes now work everywhere.

    With the custom-VJP MLLs (ops/linalg.py) the Cholesky is never
    differentiated, so vmapped restarts no longer trip the TPU
    batched-Cholesky-VJP compile blowup (round 1: 502 s compile / worker
    faults; now: 23-39 s compile, runs clean — benchmarks/probe_vmap_tpu.py).
    On a SINGLE TPU chip lax.map is still ~3-4x faster steady-state (XLA's
    TPU Cholesky gains nothing from batching, and vmapped lanes all run to
    the slowest lane's iteration count): N=640 R=8 0.45 s vs 2.09 s, N=2560
    R=4 2.12 s vs 6.57 s. So: sequential on one TPU chip — a measured
    performance choice, not a workaround; vmap elsewhere and for
    restart-sharded meshes (parallel/sharded.py)."""
    if jax.default_backend() == "tpu" and jax.device_count() == 1:
        return "sequential"
    return "vmap"


def multi_restart_minimize(fun, x0s, maxiter=250, tol=1e-6, chunk=None, mode=None):
    """Multi-restart L-BFGS over stacked starting points; best optimum wins.

    ``x0s`` is a pytree whose leaves carry a leading restart axis. Restarts
    that diverge contribute +inf and are ignored in the argmin.

    Modes:
    * 'vmap' — all restarts batched in one program (fast on CPU/GPU).
      ``chunk`` bounds how many run concurrently (lax.map of vmap) so peak
      memory scales with chunk × the per-restart working set.
    * 'sequential' — lax.map of a scan-based L-BFGS, one restart at a time
      on device. Required on TPU (see :func:`_default_mode`).
    """
    mode = _default_mode() if mode is None else mode
    R = jax.tree_util.tree_leaves(x0s)[0].shape[0]

    if mode == "sequential":
        runner = lambda x0: lbfgs_backtracking_minimize(fun, x0, maxiter=maxiter, ftol=tol)
        xs, fs, its = jax.lax.map(runner, x0s)
    else:
        if jax.default_backend() == "tpu":
            # Backtracking line search: a much smaller traced program than the
            # zoom search (nested while-of-while), which compiles slowly and
            # has faulted TPU workers at large N on this toolchain.
            runner = lambda x0: lbfgs_backtracking_minimize(fun, x0, maxiter=maxiter, ftol=tol)
        else:
            runner = lambda x0: lbfgs_minimize(fun, x0, maxiter=maxiter, tol=tol)
        if chunk is None or chunk >= R:
            xs, fs, its = jax.vmap(runner)(x0s)
        else:
            pad = (-R) % chunk
            padded = jax.tree_util.tree_map(
                lambda leaf: jnp.concatenate(
                    [leaf] + [leaf[:1]] * pad, axis=0
                ).reshape((R + pad) // chunk, chunk, *leaf.shape[1:]),
                x0s,
            )
            xs, fs, its = jax.lax.map(lambda grp: jax.vmap(runner)(grp), padded)
            xs = jax.tree_util.tree_map(
                lambda leaf: leaf.reshape(R + pad, *leaf.shape[2:])[:R], xs
            )
            fs = fs.reshape(-1)[:R]
            its = its.reshape(-1)[:R]

    fs_safe = jnp.where(jnp.isfinite(fs), fs, jnp.inf)
    best = jnp.argmin(fs_safe)
    x_best = jax.tree_util.tree_map(lambda leaf: leaf[best], xs)
    return x_best, fs_safe[best], {"all_values": fs, "iters": its, "best_restart": best}


@partial(jax.jit, static_argnums=(0,), static_argnames=("maxiter", "tol"))
def fit_kron_map(spec: GPSpec, xc_locs, Y, ls_alpha, ls_beta, u0s, maxiter=250, tol=1e-6):
    """MAP-fit the Kronecker-structured LMC by multi-restart L-BFGS.

    Module-level jit (not a per-call ``jax.jit(lambda ...)``) so repeated
    fits — cross-validation, lab loops — trace and compile once per
    (spec, shapes) instead of on every call.
    """
    from .kronecker import kron_neg_logp

    def objective(uparams):
        return kron_neg_logp(spec, uparams, xc_locs, Y, ls_alpha, ls_beta)

    u_best, f_best, aux = multi_restart_minimize(objective, u0s, maxiter=maxiter, tol=tol)
    return u_best, f_best, aux


@partial(jax.jit, static_argnums=(0,), static_argnames=("maxiter", "tol"))
def fit_laplace_map(
    spec: GPSpec, xc, xk, y, ls_alpha, ls_beta, u0s, maxiter=300, tol=1e-6, mask=None
):
    """MAP-fit classifier hyperparameters on the Laplace marginal likelihood.

    Same module-level-jit rationale as :func:`fit_kron_map`; the gradient
    never differentiates the inner Newton loop (ops/laplace.py custom VJP).
    ``mask`` marks real rows of bucket-padded data (exact masked evidence).
    """
    from .laplace import laplace_neg_logp

    def objective(uparams):
        return laplace_neg_logp(spec, uparams, xc, xk, y, ls_alpha, ls_beta, mask=mask)

    u_best, f_best, aux = multi_restart_minimize(objective, u0s, maxiter=maxiter, tol=tol)
    return u_best, f_best, aux


@partial(jax.jit, static_argnums=(0,), static_argnames=("maxiter", "tol"))
def fit_fitc_laplace_map(
    spec: GPSpec, xc, xk, xu_c, xu_k, y, ls_alpha, ls_beta, u0s,
    maxiter=300, tol=1e-6, mask=None,
):
    """MAP-fit sparse-classifier hyperparameters on the FITC-Laplace evidence.

    Same module-level-jit rationale as :func:`fit_laplace_map` (repeated
    sparse-classifier fits reuse one compiled program per (spec, shapes)).
    Gradients differentiate through the O(N·m²) Newton loop directly — the
    only factorization inside is the m×m chol(M), cheap to roll back
    (unlike the dense path's N×N, which needed ops/laplace.py's custom VJP).
    """
    from .fitc_laplace import fitc_laplace_neg_logp

    def objective(uparams):
        return fitc_laplace_neg_logp(
            spec, uparams, xc, xk, xu_c, xu_k, y, ls_alpha, ls_beta, mask=mask
        )

    u_best, f_best, aux = multi_restart_minimize(objective, u0s, maxiter=maxiter, tol=tol)
    return u_best, f_best, aux


@partial(jax.jit, static_argnums=(0,), static_argnames=("maxiter", "restart_chunk"))
def fit_gp_map(
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
    restart_chunk=None,
    mask=None,
    noise_mult=None,
):
    """MAP-fit the GP hyperparameters by multi-restart L-BFGS on device.

    Parameters are optimized in unconstrained space against
    :func:`gumbi_tpu.ops.mll.map_neg_logp`. Returns (params_natural,
    neg_logp_best, aux) where aux carries per-restart diagnostics.
    ``restart_chunk`` bounds concurrent restarts (memory control at large N);
    ``mask`` marks valid rows of bucket-padded data (shapes stay static as
    datasets grow, avoiding recompiles in lab loops); ``noise_mult`` fixes a
    per-row relative noise variance (heteroskedastic-input fits).
    """

    def objective(uparams):
        return map_neg_logp(
            spec, uparams, xc, xk, y, ls_alpha, ls_beta, jitter, mask, noise_mult
        )

    u_best, f_best, aux = multi_restart_minimize(
        objective, u0s, maxiter=maxiter, tol=tol, chunk=restart_chunk
    )
    return constrain(u_best), f_best, aux
