"""End-to-end gradient-equivalence oracles for the composed K(θ) chain rule.

The unit tests in test_linalg.py cover the custom-VJP primitives in
isolation; these tests anchor the *composed* paths the optimizer actually
runs — map_neg_logp gradients vs a plain-Cholesky autodiff implementation of
the same density, Kronecker vs dense-tall gradients, vmap(value_and_grad)
over restarts, and the FITC Woodbury MLL identity — so a regression anywhere
in the kernel→Gram→logp chain rule is caught even if every primitive still
passes its own unit tests.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import jax.scipy.linalg as jsl


@pytest.fixture()
def gp_problem():
    from gumbi_tpu.ops import CoregTerm, GPSpec, GPTerm

    rng = np.random.default_rng(3)
    n, d_out = 18, 2
    Xb = rng.uniform(-2, 2, size=(n, 2))
    Y = np.stack(
        [np.sin(Xb[:, 0]) + 0.1 * rng.normal(size=n) * (1 + j) for j in range(d_out)], axis=1
    )
    out_cg = CoregTerm(name="Parameter", col=0, d_out=d_out)
    spec = GPSpec(
        terms=(GPTerm(suffix="total", kernel="ExpQuad", coregs=(out_cg,)),),
        d_cont=2,
        ard=True,
        noise_coreg=CoregTerm(name="Output_noise", col=0, d_out=d_out),
    )
    uparams = {
        "ls_total": jnp.log(jnp.asarray([0.7, 1.1])),
        "η_total": jnp.log(jnp.asarray(1.3)),
        "σ": jnp.log(jnp.asarray(0.25)),
        "W_Parameter": jnp.asarray(rng.normal(size=(d_out, 2)) * 0.7),
        "κ_Parameter": jnp.log(jnp.asarray([0.4, 0.6])),
        "W_Output_noise": jnp.asarray(rng.normal(size=(d_out, 2)) * 0.3),
        "κ_Output_noise": jnp.log(jnp.asarray([0.8, 1.0])),
    }
    xc_tall = jnp.asarray(np.vstack([Xb] * d_out))
    xk_tall = jnp.asarray(np.repeat(np.arange(d_out), n)[:, None].astype(np.int32))
    y_tall = jnp.asarray(Y.T.reshape(-1))
    la = jnp.asarray([2.0, 2.0])
    lb = jnp.asarray([1.0, 1.0])
    return spec, uparams, jnp.asarray(Xb), jnp.asarray(Y), xc_tall, xk_tall, y_tall, la, lb


def test_map_neg_logp_grads_match_plain_autodiff(gp_problem):
    """End-to-end: hyperparameter grads through the custom-VJP MLL equal the
    grads of a plain-cholesky-autodiff implementation of the same density."""
    from gumbi_tpu.ops.kernels import gram, noise_diag
    from gumbi_tpu.ops.mll import DEFAULT_JITTER, map_neg_logp
    from gumbi_tpu.ops.priors import constrain, log_prior

    spec, uparams, Xb, Y, xc, xk, y, la, lb = gp_problem

    def plain(uparams):
        params = constrain(uparams)
        K = gram(spec, params, xc, xk, xc, xk)
        d = noise_diag(spec, params, xk, dtype=K.dtype) + DEFAULT_JITTER
        L = jnp.linalg.cholesky(K + jnp.diag(d))
        alpha = jsl.solve_triangular(L, y, lower=True)
        logp = (
            -0.5 * jnp.sum(alpha**2)
            - jnp.sum(jnp.log(jnp.diag(L)))
            - 0.5 * y.shape[0] * jnp.log(2 * jnp.pi)
        )
        return -(logp + log_prior(spec, uparams, la, lb))

    custom = lambda u: map_neg_logp(spec, u, xc, xk, y, la, lb)
    assert np.isclose(float(custom(uparams)), float(plain(uparams)), rtol=1e-11)
    g_custom = jax.grad(custom)(uparams)
    g_plain = jax.grad(plain)(uparams)
    for k in uparams:
        assert np.allclose(
            np.asarray(g_custom[k]), np.asarray(g_plain[k]), rtol=1e-7, atol=1e-10
        ), k


def test_kron_neg_logp_grads_match_dense(gp_problem):
    """Kronecker (batched custom-VJP) grads ≡ dense tall-path grads."""
    from gumbi_tpu.ops.kronecker import kron_neg_logp
    from gumbi_tpu.ops.mll import map_neg_logp

    spec, uparams, Xb, Y, xc, xk, y, la, lb = gp_problem

    g_dense = jax.grad(lambda u: map_neg_logp(spec, u, xc, xk, y, la, lb))(uparams)
    g_kron = jax.grad(lambda u: kron_neg_logp(spec, u, Xb, Y, la, lb))(uparams)
    for k in uparams:
        assert np.allclose(
            np.asarray(g_kron[k]), np.asarray(g_dense[k]), rtol=1e-6, atol=1e-9
        ), k


def test_vmapped_restart_grads(gp_problem):
    """vmap(value_and_grad) over stacked restarts — the exact composition the
    multi-restart optimizer runs on TPU — matches per-restart results."""
    from gumbi_tpu.ops.kronecker import kron_neg_logp

    spec, uparams, Xb, Y, xc, xk, y, la, lb = gp_problem
    rng = np.random.default_rng(0)
    R = 4
    u0s = {
        k: jnp.asarray(np.asarray(v)[None] + 0.1 * rng.normal(size=(R,) + np.asarray(v).shape))
        for k, v in uparams.items()
    }
    f = lambda u: kron_neg_logp(spec, u, Xb, Y, la, lb)
    vals, grads = jax.vmap(jax.value_and_grad(f))(u0s)
    for i in range(R):
        ui = {k: v[i] for k, v in u0s.items()}
        vi, gi = jax.value_and_grad(f)(ui)
        assert np.isclose(float(vals[i]), float(vi), rtol=1e-10)
        for k in ui:
            assert np.allclose(np.asarray(grads[k][i]), np.asarray(gi[k]), rtol=1e-8), k


def test_fitc_mll_woodbury_identity():
    """The solve-based FITC MLL equals the naive dense N(0, Q+Λ) logpdf."""
    from gumbi_tpu.ops import GPSpec, GPTerm
    from gumbi_tpu.ops.fitc import _stabilized_kuu, fitc_mll
    from gumbi_tpu.ops.kernels import gram, gram_diag, noise_diag
    from gumbi_tpu.ops.mll import DEFAULT_JITTER

    rng = np.random.default_rng(4)
    n, m = 30, 9
    spec = GPSpec(terms=(GPTerm(suffix="total", kernel="ExpQuad"),), d_cont=1)
    params = {"ls_total": jnp.asarray([0.8]), "η_total": jnp.asarray(1.1), "σ": jnp.asarray(0.3)}
    xc = jnp.asarray(rng.uniform(-2, 2, size=(n, 1)))
    xk = jnp.zeros((n, 0), dtype=jnp.int32)
    xu_c = jnp.asarray(np.linspace(-2, 2, m)[:, None])
    xu_k = jnp.zeros((m, 0), dtype=jnp.int32)
    y = jnp.asarray(np.sin(np.asarray(xc[:, 0])) + 0.1 * rng.normal(size=n))

    val = float(fitc_mll(spec, params, xc, xk, xu_c, xu_k, y))

    Kuu = np.asarray(_stabilized_kuu(spec, params, xu_c, xu_k, xc.dtype, DEFAULT_JITTER))
    Kux = np.asarray(gram(spec, params, xu_c, xu_k, xc, xk))
    Q = Kux.T @ np.linalg.solve(Kuu, Kux)
    lam = np.maximum(np.asarray(gram_diag(spec, params, xc, xk)) - np.diag(Q), 0.0) + np.asarray(
        noise_diag(spec, params, xk, dtype=xc.dtype)
    )
    cov = Q + np.diag(lam)
    from scipy.stats import multivariate_normal

    ref = multivariate_normal(mean=np.zeros(n), cov=cov).logpdf(np.asarray(y))
    assert np.isclose(val, ref, rtol=1e-9)

    # And the gradient path must be finite and vmap-safe
    def neg(u):
        p = {k: jnp.exp(v) for k, v in u.items()}
        return -fitc_mll(spec, p, xc, xk, xu_c, xu_k, y)

    u = {k: jnp.log(v) for k, v in params.items()}
    g = jax.grad(neg)(u)
    assert all(np.all(np.isfinite(np.asarray(v))) for v in g.values())
