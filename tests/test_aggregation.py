"""Standardizer and DataSet behavior, with golden values from the reference
test suite (reference tests/test_aggregation.py — pure math, transfers
verbatim)."""

import numpy as np
import pandas as pd
import pytest

from gumbi_tpu import DataSet, Standardizer, WideData
from gumbi_tpu.data import example_tidy

example_stdzr = {
    "a": {"μ": -0.762, "σ2": 1.258**2},
    "b": {"μ": -0.0368, "σ2": 0.351**2},
    "c": {"μ": -5.30, "σ2": 0.582**2},
    "d": {"μ": -0.307, "σ2": 0.158**2},
    "e": {"μ": -1.056, "σ2": 0.398**2},
    "f": {"μ": 3.34, "σ2": 0.1501**2},
    "X": {"μ": -0.282, "σ2": 1**2},
    "Y": {"μ": 4.48, "σ2": 0.75**2},
    "lg10_Z": {"μ": 5, "σ2": 2**2},
}

log_vars = ["d", "f", "b", "c", "Y"]
logit_vars = ["e", "X"]


def test_stdz_roundtrip_all_vars():
    s = Standardizer(**example_stdzr, log_vars=log_vars, logit_vars=logit_vars)
    nat_defaults = {p: s.untransform(p, v["μ"]) for p, v in example_stdzr.items()}
    assert np.allclose([s.stdz(p, x) for p, x in nat_defaults.items()], 0)
    assert np.allclose(
        [s.unstdz(p, s.stdz(p, nat_defaults[p])) for p in example_stdzr],
        list(nat_defaults.values()),
    )


def test_stdz_values_and_dists():
    stdzr = Standardizer(x={"μ": 1, "σ2": 0.1}, d={"μ": 0, "σ2": 0.1}, log_vars=["d"])
    assert stdzr.transform("x", μ=1) == 1
    assert stdzr.stdz("x", 1) == 0.0
    assert stdzr.unstdz("x", 0) == 1.0
    assert np.isclose(stdzr.stdz("x", 1 + 0.1**0.5), 1.0)
    assert np.isclose(stdzr.unstdz("x", 1), 1 + 0.1**0.5)
    assert stdzr.stdz("d", 1) == 0.0
    assert np.isclose(stdzr.stdz("d", np.exp(0.1**0.5)), 1.0)

    assert stdzr.transform("x", μ=1, σ2=0.1) == (1, 0.1)
    assert stdzr.stdz("x", 1, 0.1) == (0.0, 1.0)
    assert stdzr.stdz("d", 1, 0.1) == (0.0, 1.0)
    assert stdzr.transform("d", 1, 0.1) == (0.0, 0.1)


def test_stdz_series():
    stdzr = Standardizer(x={"μ": 1, "σ2": 0.1}, d={"μ": 0, "σ2": 0.1}, log_vars=["d"])
    x_series = pd.Series(np.arange(1, 5), name="x")
    assert np.allclose(stdzr.stdz(x_series).values, [0.0, 3.162278, 6.324555, 9.486833])
    r_series = pd.Series(np.arange(1, 5), name="d")
    assert np.allclose(stdzr.stdz(r_series).values, [0.0, 2.19192384, 3.4741171, 4.38384769])


def test_sigma_kwarg_and_merge():
    s1 = Standardizer(a={"μ": 1, "σ": 2})
    assert s1["a"]["σ2"] == 4
    s2 = Standardizer(b={"μ": 0, "σ2": 1}, log_vars=["b"])
    merged = s1 | s2
    assert merged.log_vars == ["b"]
    assert set(merged.keys()) == {"a", "b"}


@pytest.fixture
def example_dataset():
    df = example_tidy()
    ds = DataSet.from_tidy(
        df, names_column="Parameter", log_vars=["Y", "c", "b"], logit_vars=["X", "e"]
    )
    assert ds.wide is not None
    assert ds.wide.z is not None
    assert ds.tidy is not None
    assert ds.tidy.z is not None
    return ds


def test_tidy_z(example_dataset):
    ds = example_dataset
    assert ds.tidy.z.shape == ds.tidy.shape
    assert np.allclose(
        [
            ds.tidy.z[ds.tidy.z.Parameter == p]["Value"].mean()
            for p in ds.tidy.z.Parameter.unique()
        ],
        0,
        atol=1e-10,
    )


def test_wide_tidy_roundtrip(example_dataset):
    ds = example_dataset
    wide = ds.wide
    tidy = ds.tidy
    assert len(tidy) == len(wide) * len(ds.outputs)
    back = tidy.to_wide()
    assert set(back.columns) == set(wide.columns)


def test_wide_io(example_dataset):
    ds = example_dataset
    wide_out = ds.wide
    wide_in_wd = WideData(
        wide_out, outputs=ds.outputs, log_vars=["Y", "c", "b"], logit_vars=["X", "e"]
    )
    wide_in_ds = DataSet(
        pd.DataFrame(wide_out), outputs=ds.outputs, log_vars=["Y", "c", "b"], logit_vars=["X", "e"]
    )
    pd.testing.assert_frame_equal(pd.DataFrame(wide_in_wd), pd.DataFrame(wide_out))
    pd.testing.assert_frame_equal(pd.DataFrame(wide_in_wd), pd.DataFrame(wide_in_ds.wide))

    ds.wide = wide_out.drop(0)
    pd.testing.assert_frame_equal(pd.DataFrame(ds.wide), pd.DataFrame(wide_out.drop(0)))


def test_dataset_specs_and_update(example_dataset):
    ds = example_dataset
    specs = ds.specs
    assert specs["outputs"] == ds.outputs
    assert specs["stdzr"] is ds.stdzr
    ds.update_stdzr()  # no error; moments refreshed in place
    assert "Y" in ds.stdzr
