"""ParrayPlotter smoke tests across spaces and array types
(mirrors reference tests/test_plots.py coverage)."""

import matplotlib.pyplot as plt
import numpy as np
import pytest

from gumbi_tpu import ParameterArray, ParrayPlotter, Standardizer, UncertainParameterArray

stdzr = Standardizer(
    x={"μ": -5, "σ": 0.5},
    y={"μ": -0.3, "σ": 0.15},
    z={"μ": 2, "σ": 2},
    log_vars=["x", "y"],
    logit_vars=["z"],
)


@pytest.fixture
def xyz():
    x = np.arange(1, 10, 0.25)
    y = np.arange(1, 10, 0.25)
    x, y = np.meshgrid(x, y)
    z = np.sin(np.sqrt((x - 5) ** 2 + (y - 5) ** 2)) ** 2 * 0.9 + 0.05
    return ParameterArray(x=x, y=y, z=z, stdzr=stdzr)


def teardown_function(fn):
    plt.close("all")


def test_contour_natural(xyz):
    pp = ParrayPlotter(xyz["x"], xyz["y"], xyz["z"])
    pp(plt.contour, levels=8)


def test_pcolormesh_and_colorbar(xyz):
    pp = ParrayPlotter(xyz["x"], xyz["y"], xyz["z"])
    pcm = pp(plt.pcolormesh, shading="gouraud")
    cbar = pp.colorbar(pcm, ax=plt.gca())
    assert cbar is not None


def test_mixed_spaces(xyz):
    pp = ParrayPlotter(
        xyz["x"], xyz["y"].t, xyz["z"], z_scale="standardized", z_tick_scale="standardized"
    )
    cs = pp(plt.contourf)
    pp.colorbar(cs)


def test_suffix_detection(xyz):
    pp = ParrayPlotter(xyz["x"], xyz["y"].z)
    assert pp.y_scale == "standardized"
    pp = ParrayPlotter(xyz["x"], xyz["y"].t)
    assert pp.y_scale == "transformed"


def test_1d_line_with_ci():
    x = ParameterArray(x=np.linspace(1, 5, 40), stdzr=stdzr)
    upa = UncertainParameterArray(
        "y", np.exp(np.linspace(-1, 0, 40)), np.full(40, 0.01), stdzr=stdzr
    )
    ax = ParrayPlotter(x, upa).plot(ci=0.9)
    assert ax.get_xlabel() == "x"
    assert ax.get_ylabel() == "y"


def test_1d_errorbar_style():
    x = ParameterArray(x=np.linspace(1, 5, 10), stdzr=stdzr)
    upa = UncertainParameterArray("y", np.exp(np.linspace(-1, 0, 10)), np.full(10, 0.01), stdzr=stdzr)
    pp = ParrayPlotter(x, upa)
    pp.plot(ci=None)
    pp.plot_ci(ci_style="errorbar")


def test_standardized_ticks_natural_labels():
    x = ParameterArray(x=np.linspace(1, 5, 20), stdzr=stdzr)
    upa = UncertainParameterArray("y", np.exp(np.linspace(-1, 0, 20)), np.full(20, 0.01), stdzr=stdzr)
    pp = ParrayPlotter(x, upa, x_scale="standardized", x_tick_scale="natural")
    ax = pp.plot()
    assert ax is not None


def test_plain_ndarray_inputs():
    x = np.linspace(0, 1, 10)
    y = np.sin(x)
    pp = ParrayPlotter(x, y, stdzr=stdzr)
    pp(plt.plot)


def test_missing_stdzr_raises():
    with pytest.raises(ValueError):
        ParrayPlotter(np.arange(3), np.arange(3))
