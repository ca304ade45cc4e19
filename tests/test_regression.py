"""Regressor parsing + GP fit/predict integration tests.

Mirrors the reference test strategy (reference tests/test_regression.py):
parsing assertions on a 66-row lab-style dataset, fit smoke tests, and the
cars ("mpg") quickstart as the end-to-end acceptance test.
"""

import numpy as np
import pandas as pd
import pytest

import gumbi_tpu as gmb
from gumbi_tpu import GP, DataSet, ParrayPlotter, Standardizer
from gumbi_tpu.data import cars, example_tidy


@pytest.fixture(scope="module")
def example_estimates():
    df = example_tidy()
    ds = DataSet.from_tidy(
        df, names_column="Parameter", log_vars=["Y", "c", "b", "d", "f"], logit_vars=["X", "e"]
    )
    return ds


@pytest.fixture
def example_gp(example_estimates):
    return GP(example_estimates, outputs="d")


# ------------------------------------------------------------------
# Input argument parsing
# ------------------------------------------------------------------


def test_gp_default_fit_parsing(example_gp):
    gp = example_gp.specify_model(continuous_dims=["X", "Y"])
    assert gp.continuous_dims == ["X", "Y"]
    assert gp.categorical_dims == []


def test_gp_data_parsing(example_gp):
    gp = example_gp.specify_model(continuous_dims=["X", "Y"])
    X, y = gp.get_structured_data()
    assert X.shape == (66,)
    assert len(X.names) == 2
    assert y.shape == (66,)


def test_gp_numerical_continuous_fit_parsing(example_gp):
    gp = example_gp.specify_model(continuous_dims=["X", "Y", "lg10_Z"])
    assert gp.continuous_dims == ["X", "Y", "lg10_Z"]
    for dim in gp.continuous_dims:
        assert len(gp.continuous_levels[dim]) == len(gp.data.tidy[dim].unique())
        assert len(gp.continuous_coords[dim].values()) == len(gp.continuous_levels[dim])
    assert gp.categorical_dims == []
    X, y = gp.get_structured_data()
    assert X.shape == (66,)
    assert len(X.names) == 3


def test_gp_categorical_continuous_fit_parsing(example_gp):
    # A string column used as a continuous dim gets integer codes
    gp = example_gp.specify_model(continuous_dims=["X", "Y", "Name"])
    assert gp.continuous_dims == ["X", "Y", "Name"]
    assert gp.categorical_dims == []
    X, y = gp.get_structured_data()
    assert X.shape == (66,)
    assert len(X.names) == 3


def test_gp_params_fit_parsing(example_gp):
    gp = example_gp.specify_model(outputs=["d", "c"], continuous_dims=["X", "Y"])
    assert gp.continuous_dims == ["X", "Y"]
    assert gp.categorical_dims == ["Parameter"]
    assert gp.categorical_levels == {"Parameter": ["d", "c"]}
    assert gp.categorical_coords == {"Parameter": {"d": 1, "c": 0}}
    X, y = gp.get_structured_data()
    assert X.shape == (66,)
    assert len(X.names) == 2
    assert y.shape == (66,)
    assert len(y.names) == 2


def test_gp_single_level_becomes_filter(example_gp):
    gp = example_gp.specify_model(
        continuous_dims=["X", "Y", "Name"],
        continuous_levels={"Name": ["intense-opportunity"]},
    )
    assert gp.continuous_dims == ["X", "Y"]
    assert gp.filter_dims == {"Name": ["intense-opportunity"], "Parameter": ["d"]}
    X, y = gp.get_structured_data()
    assert X.shape == (6,)
    assert len(X.names) == 2
    assert y.shape == (6,)


def test_shaped_data_categorical_columns_are_indices(example_gp):
    gp = example_gp.specify_model(outputs=["d", "c"], continuous_dims=["X", "Y"])
    X, y = gp.get_shaped_data()
    assert X.shape == (132, 3)
    # Output column carries raw integer coordinates (0/1), not z-values
    assert set(np.unique(X[:, 2])) == {0.0, 1.0}
    assert y.shape == (132,)


# ------------------------------------------------------------------
# Model building and fitting
# ------------------------------------------------------------------


def test_gp_build_model(example_gp):
    from gumbi_tpu.ops import GPSpec

    gp = example_gp.specify_model(continuous_dims=["X", "Y"])
    gp.build_model()
    assert isinstance(gp.model, GPSpec)
    assert gp.model.d_cont == 2
    assert gp.model.terms[0].suffix == "total"


def test_gp_build_model_multioutput(example_gp):
    gp = example_gp.specify_model(outputs=["d", "c"], continuous_dims=["X", "Y"])
    gp.build_model()
    (term,) = gp.model.terms
    assert [cg.name for cg in term.coregs] == ["Parameter"]
    assert gp.model.noise_coreg is not None
    assert gp.model.noise_coreg.name == "Output_noise"


def test_gp_build_model_additive(example_gp):
    gp = example_gp.specify_model(
        outputs=["d", "c"],
        continuous_dims=["X", "Y"],
        categorical_dims="lg10_Z",
        additive=True,
    )
    gp.build_model()
    suffixes = [t.suffix for t in gp.model.terms]
    assert suffixes == ["total", "lg10_Z"]
    # The per-dim term carries its own coregion plus the shared output coregion
    assert {cg.name for cg in gp.model.terms[1].coregs} == {"lg10_Z", "Parameter"}


def test_gp_fit_simple(example_gp):
    gp = example_gp.fit(
        continuous_dims=["X", "Y"],
        MAP_kwargs=dict(n_restarts=2, maxiter=100),
    )
    assert isinstance(gp.MAP, dict)
    assert "ls_total" in gp.MAP and gp.MAP["ls_total"].shape == (2,)
    assert "σ" in gp.MAP and gp.MAP["σ"] > 0


@pytest.mark.slow
def test_gp_fit_multioutput_predict(example_gp):
    gp = example_gp.fit(
        outputs=["d", "c"],
        continuous_dims=["X", "Y"],
        MAP_kwargs=dict(n_restarts=2, maxiter=100),
    )
    assert isinstance(gp.MAP, dict)
    assert gp.MAP["W_Parameter"].shape == (2, 2)

    gp.prepare_grid(resolution=11)
    pred = gp.predict_grid()
    assert pred.shape == (11, 11)
    # Multi-output prediction → mvuparray with a valid correlation matrix
    cor = pred.cor
    assert cor.shape == (2, 2)
    assert np.allclose(np.diag(cor), 1.0)
    assert abs(cor[0, 1]) <= 1.0


# ------------------------------------------------------------------
# Quickstart end-to-end (the de-facto acceptance test; reference
# tests/test_regression.py:184-191 ran this on seaborn's mpg)
# ------------------------------------------------------------------


def test_gp_predict_quickstart():
    df = cars()
    ds = DataSet(
        df, outputs=["mpg", "acceleration"], log_vars=["mpg", "acceleration", "horsepower"]
    )
    gp = GP(ds)
    gp.fit(
        outputs=["mpg"],
        continuous_dims=["horsepower"],
        MAP_kwargs=dict(n_restarts=4, maxiter=200),
    )
    X = gp.prepare_grid()
    y = gp.predict_grid()
    assert y.shape == (100,)

    # The fitted surface must track the data: mpg falls with horsepower
    mu = y.μ
    assert mu[0] > mu[-1]

    ax = ParrayPlotter(X, y).plot()
    assert ax is not None

    # Conditional slice machinery (1-D grid: condition on nothing → identity)
    grid, cond = gp.get_conditional_prediction()
    assert cond.shape == y.shape

    # In-sample RMSE sanity (natural space, log-normal medians)
    Xd, yd = gp.get_structured_data()
    preds = gp.predict_points(Xd)
    rel_err = np.abs(preds.μ - yd.values()) / yd.values()
    assert np.median(rel_err) < 0.2


def test_gp_fit_independent_multitask(example_gp):
    gp = example_gp.fit(
        outputs=["d", "c"],
        continuous_dims=["X", "Y"],
        multitask_kernel="Independent",
        MAP_kwargs=dict(n_restarts=2, maxiter=80),
    )
    assert gp._structure == "Independent"
    assert set(gp.MAP.keys()) == {"d", "c"}
    gp.prepare_grid(resolution=8)
    pred = gp.predict_grid()
    assert np.allclose(pred.cor, np.eye(2))


def test_gp_fit_kronecker_matches_hadamard(example_gp):
    gp_k = example_gp.fit(
        outputs=["d", "c"],
        continuous_dims=["X", "Y"],
        multitask_kernel="Kronecker",
        MAP_kwargs=dict(n_restarts=2, maxiter=120),
    )
    assert gp_k._structure == "Kronecker"
    gp_k.prepare_grid(resolution=8)
    y_k = gp_k.predict_grid()

    gp_h = GP(gp_k.data, outputs=["d", "c"])
    gp_h.fit(
        outputs=["d", "c"],
        continuous_dims=["X", "Y"],
        multitask_kernel="Hadamard",
        MAP_kwargs=dict(n_restarts=2, maxiter=120),
    )
    assert gp_h._structure == "Hadamard"
    gp_h.prepare_grid(resolution=8)
    y_h = gp_h.predict_grid()

    # Same model, same restarts → same optimum and posterior
    d_k, d_h = y_k.get("d"), y_h.get("d")
    assert np.allclose(d_k.μ, d_h.μ, rtol=1e-3, atol=1e-4)


def test_parity_import_paths():
    from gumbi_tpu.regression import GP as GP2, GPC, Regressor
    from gumbi_tpu.utils.gp_utils import get_ls_prior, parse_ls_limits

    assert GP2 is GP
    # Backend-path spellings (ref gumbi/regression/{pymc,botorch}/__init__.py)
    from gumbi_tpu.regression.botorch import GP as BGP, BotorchGP
    from gumbi_tpu.regression.pymc import GP as PGP, GPC as PGPC, PymcGP, PymcGPC

    assert BGP is GP and BotorchGP is GP and PGP is GP and PymcGP is GP
    assert PGPC is GPC and PymcGPC is GPC
    from gumbi_tpu.utils.misc import list_and, list_is_are

    assert list_and(["a", "b", "c"]) == "a, b, and c"
    assert list_is_are(["a"]) == "a is" and list_is_are(["a", "b"]) == "a and b are"
    X = np.linspace(0, 1, 12)[:, None]
    lo, hi = parse_ls_limits(X, ARD=True)
    assert len(lo) == 1 and 0.01 <= lo[0] < hi[0]
    p = get_ls_prior(X, ARD=True)
    assert len(p["alpha"]) == 1 and p["alpha"][0] > 0


# Combinatorial fit matrix mirroring the reference slow suite
# (reference tests/test_regression.py:125-182)
@pytest.fixture(
    params=[
        {"outputs": ["d", "c"], "continuous_dims": ["X", "Y"]},
        {"continuous_dims": ["X", "Y"], "categorical_dims": "Code"},
        {"continuous_dims": ["X", "Y", "Name"]},
        {"continuous_dims": ["X", "Y", "lg10_Z"]},
        {
            "continuous_dims": ["X", "Y", "Name"],
            "continuous_levels": {"Name": ["intense-opportunity"]},
        },
    ]
)
def fit_inputs(request):
    return request.param


@pytest.fixture(params=[False, True])
def additive(request):
    return request.param


@pytest.mark.slow
def test_gp_fit_matrix(example_gp, fit_inputs, additive):
    gp = example_gp.fit(
        **fit_inputs, additive=additive, MAP_kwargs=dict(n_restarts=2, maxiter=60)
    )
    assert isinstance(gp.MAP, dict)
