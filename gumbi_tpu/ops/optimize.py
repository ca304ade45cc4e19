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
    "lbfgs_host_minimize",
    "multi_restart_minimize",
    "multi_restart_minimize_hostloop",
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


def lbfgs_host_minimize(
    fun, x0, maxiter=100, ftol=1e-6, memory_size=16, max_backtracking=20,
    vg_fun=None, v_fun=None,
):
    """L-BFGS with the loop on the HOST: each device program is ONE evaluation.

    Same algorithm as :func:`lbfgs_backtracking_minimize` (two-loop-recursion
    direction, Armijo backtracking, best-finite-iterate return, relative-
    decrease stop) but direction/memory/line-search bookkeeping runs in host
    numpy (f64) and the device only ever executes a jitted value+grad or a
    jitted value. This exists for the large-N polish stage of the iterative
    engine: there a single objective evaluation at an ill-conditioned start
    runs 30-250 s on-device (mBCG at maxiter), and a compiled L-BFGS step —
    one value+grad plus up to ``max_backtracking`` trial values inside ONE
    uninterruptible XLA program — exceeds what the remote TPU service will
    run (measured: a single value+grad passes at 252 s, the one-iteration
    L-BFGS program crashes the worker; bisect in docs/perf.md decision 14).
    Per-dispatch overhead is milliseconds against multi-second evaluations,
    so steady cost matches the compiled loop. Must be called OUTSIDE jit.

    A non-finite objective at ``x0`` returns ``(x0, inf, 0)`` after exactly
    one dispatch — callers use this as the convergence probe for the
    iterative engine's guarded objective (a separate probe evaluation would
    duplicate the most expensive dispatch of the run).

    ``vg_fun``/``v_fun``, if given, replace the internally-jitted
    value+grad / value evaluators (pytree → (float-like, grad pytree) /
    float-like). Pass module-level-jitted wrappers so repeated fits at the
    same shapes reuse the traced executables instead of retracing a fresh
    closure per fit (same rationale as :func:`fit_kron_map`).

    Returns ``(x_best, f_best, n_iters)`` exactly like the compiled variant.
    """
    import numpy as np

    leaves, treedef = jax.tree_util.tree_flatten(x0)
    shapes = [leaf.shape for leaf in leaves]
    sizes = [int(np.prod(s)) if s else 1 for s in shapes]
    dtypes = [leaf.dtype for leaf in leaves]

    def pack(tree):
        ls = jax.tree_util.tree_leaves(tree)
        return np.concatenate([np.asarray(l, np.float64).ravel() for l in ls])

    def unpack(vec):
        out, o = [], 0
        for s, sz, dt in zip(shapes, sizes, dtypes):
            out.append(jnp.asarray(vec[o : o + sz].reshape(s), dt))
            o += sz
        return jax.tree_util.tree_unflatten(treedef, out)

    import os
    import sys
    import time as _time

    _log = os.environ.get("GUMBI_TPU_POLISH_LOG", "0") == "1"
    _nvg = _nv = 0

    vg_dev = jax.jit(jax.value_and_grad(fun)) if vg_fun is None else vg_fun
    v_dev = jax.jit(fun) if v_fun is None else v_fun

    def vg(vec):
        nonlocal _nvg
        t0 = _time.perf_counter()
        v, gtree = vg_dev(unpack(vec))
        out = float(v), pack(gtree)
        _nvg += 1
        if _log:
            print(
                f"[polish] vg#{_nvg} f={out[0]:.6g} {_time.perf_counter() - t0:.2f}s",
                file=sys.stderr,
            )
        return out

    def v_only(vec):
        nonlocal _nv
        t0 = _time.perf_counter()
        out = float(v_dev(unpack(vec)))
        _nv += 1
        if _log:
            print(
                f"[polish] v#{_nv} f={out:.6g} {_time.perf_counter() - t0:.2f}s",
                file=sys.stderr,
            )
        return out

    x = pack(x0)
    f, g = vg(x)
    best_x, best_f = x.copy(), f if np.isfinite(f) else np.inf
    mem_s, mem_y, mem_rho = [], [], []
    n_iters = 0
    f_prev = np.inf

    for _ in range(maxiter):
        if not np.isfinite(f):
            break
        # two-loop recursion
        q = g.copy()
        alphas = []
        for s, y_, rho in zip(reversed(mem_s), reversed(mem_y), reversed(mem_rho)):
            a = rho * (s @ q)
            alphas.append(a)
            q -= a * y_
        if mem_s:
            ys = mem_y[-1] @ mem_s[-1]
            yy = mem_y[-1] @ mem_y[-1]
            q *= ys / yy if yy > 0 else 1.0
        for (s, y_, rho), a in zip(zip(mem_s, mem_y, mem_rho), reversed(alphas)):
            q += (a - rho * (y_ @ q)) * s
        p = -q
        gTp = g @ p
        if not np.isfinite(gTp) or gTp >= 0:  # not a descent direction: restart
            p, gTp = -g, -(g @ g)

        # Line search. The full step is the common accept near convergence,
        # so evaluate it with value+grad directly — when Armijo passes we
        # already hold the new gradient and the iteration costs ONE solve
        # instead of trial + re-evaluation. Only on rejection fall back to
        # value-only backtracking trials (like the compiled variant), with
        # one value+grad at the accepted point.
        f_new, x_new, g_new = np.inf, x, g
        x_try = x + p
        f_try, g_try = vg(x_try)
        if np.isfinite(f_try) and f_try <= f + 1e-4 * gTp:
            f_new, x_new, g_new = f_try, x_try, g_try
        else:
            step = 0.5
            for _bt in range(max_backtracking - 1):
                x_try = x + step * p
                f_try = v_only(x_try)
                if np.isfinite(f_try) and f_try <= f + 1e-4 * step * gTp:
                    f_new, x_new = f_try, x_try
                    break
                step *= 0.5
        n_iters += 1
        if not np.isfinite(f_new):  # line search failed everywhere
            break
        if g_new is g:  # accepted a backtracked point: fetch its gradient
            _, g_new = vg(x_new)
        s_vec, y_vec = x_new - x, g_new - g
        sy = s_vec @ y_vec
        if np.isfinite(sy) and sy > 1e-10:
            mem_s.append(s_vec)
            mem_y.append(y_vec)
            mem_rho.append(1.0 / sy)
            if len(mem_s) > memory_size:
                mem_s.pop(0)
                mem_y.pop(0)
                mem_rho.pop(0)
        x, f_prev, f, g = x_new, f, f_new, g_new
        if f < best_f:
            best_x, best_f = x.copy(), f
        if abs(f_prev - f) < ftol * (1.0 + abs(f)):
            break

    return unpack(best_x), jnp.asarray(best_f), jnp.asarray(n_iters)


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


def multi_restart_minimize_hostloop(fun, x0s, maxiter=250, tol=1e-6, runner=None):
    """Multi-restart L-BFGS as R async dispatches of ONE single-restart program.

    Same optimizer, same restarts, same argmin semantics as
    :func:`multi_restart_minimize` — but the compiled program contains a
    single L-BFGS chain instead of a vmap/lax.map over all R. On the remote
    TPU service the big batched program is re-processed for 86-391 s per
    fresh process even on a jax-cache hit (and the vmapped L-BFGS Cholesky
    program has wedged the axon compiler outright — measured, docs/perf.md
    §9 / bench.py COARSE_MODE); the single-restart program loads in ~2 s and
    the R dispatches pipeline asynchronously, so steady cost is within noise
    of the batched form. Must be called OUTSIDE jit (the host loop would
    unroll under trace) — it is the driver for host-level fit entry points,
    not for use inside compiled objectives.
    """
    R = jax.tree_util.tree_leaves(x0s)[0].shape[0]
    if runner is None:
        # per-call closure: traces fresh every invocation. Callers that
        # refit at fixed shapes pass a module-level-jitted ``runner``
        # (e.g. :func:`coarse_restart_map`) so the executable is reused.
        runner = jax.jit(
            lambda x0: lbfgs_backtracking_minimize(fun, x0, maxiter=maxiter, ftol=tol)
        )
    outs = [
        runner(jax.tree_util.tree_map(lambda leaf: leaf[i], x0s)) for i in range(R)
    ]
    xs = jax.tree_util.tree_map(lambda *leaves: jnp.stack(leaves), *[o[0] for o in outs])
    fs = jnp.stack([o[1] for o in outs])
    its = jnp.stack([o[2] for o in outs])

    @jax.jit
    def select(xs, fs, its):
        fs_safe = jnp.where(jnp.isfinite(fs), fs, jnp.inf)
        best = jnp.argmin(fs_safe)
        x_best = jax.tree_util.tree_map(lambda leaf: leaf[best], xs)
        return x_best, fs_safe[best], {"all_values": fs, "iters": its, "best_restart": best}

    x_best, f_best, aux = select(xs, fs, its)
    # The stacked per-restart optima ride along (a handful of scalars per
    # restart): staged large-N fits fall back to runner-up candidates when
    # the winner's full-N objective is unconverged (models/gp.py).
    aux["all_xs"] = xs
    return x_best, f_best, aux


@partial(jax.jit, static_argnums=(0,), static_argnames=("maxiter", "tol"))
def coarse_restart_map(spec: GPSpec, xc, xk, y, ls_alpha, ls_beta, u0, maxiter=40, tol=1e-5):
    """ONE L-BFGS restart of the dense-Cholesky MAP objective.

    The single-restart program behind the staged large-N coarse triage:
    module-level jit (same rationale as :func:`fit_kron_map`) so repeated
    fits at the same shapes — lab loops, cross-validation, a re-fit after
    appending bucketed data — reuse the traced executable instead of
    retracing a fresh closure per fit. Dispatched asynchronously per restart
    by :func:`multi_restart_minimize_hostloop` via its ``runner=``.
    """

    def objective(u):
        return map_neg_logp(spec, u, xc, xk, y, ls_alpha, ls_beta)

    return lbfgs_backtracking_minimize(objective, u0, maxiter=maxiter, ftol=tol)


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
