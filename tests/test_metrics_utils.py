"""Information metrics, lengthscale-delta helpers, isotropic vars, misc utils."""

import numpy as np
import pytest
from scipy.stats import norm

import gumbi_tpu as gmb
from gumbi_tpu import Standardizer, uarray
from gumbi_tpu.array_utils import make_deltas_parray
from gumbi_tpu.utils import (
    InstanceCopy,
    Trigger,
    batched,
    flatten,
    group_by,
    one,
    round_to_n,
)


def test_uarray_information_metrics():
    a = uarray("A", μ=np.array(0.0), σ2=np.array(1.0))
    b = uarray("A", μ=np.array(1.0), σ2=np.array(2.0))

    # KLD against the closed form for two normals
    kld = float(a.KLD(b))
    expected = np.log(np.sqrt(2.0) / 1.0) + (1.0 + 1.0) / (2 * 2.0) - 0.5
    assert np.isclose(kld, expected)
    assert np.isclose(float(a.KLD(a)), 0.0)

    # Bhattacharyya distance/coefficient and Hellinger
    bd = float(a.BD(b))
    assert bd > 0
    assert np.isclose(float(a.BC(b)), np.exp(-bd))
    assert 0 < float(a.HD(b)) < 1
    assert np.isclose(float(a.HD(a)), 0.0, atol=1e-8)

    # nlpd matches -log N(x; μ, σ)
    x = 0.7
    assert np.isclose(float(a.nlpd(x)), -norm(0, 1).logpdf(x))

    # vEI: tighter posteriors near the target score higher
    near = uarray("A", μ=np.array(1.0), σ2=np.array(0.01))
    far = uarray("A", μ=np.array(5.0), σ2=np.array(0.01))
    assert float(near.vEI(target=1.0, best_yet=4.0)) > float(far.vEI(target=1.0, best_yet=4.0))


def test_make_deltas_parray():
    stdzr = Standardizer(x={"μ": 0.0, "σ2": 4.0}, r={"μ": 0.0, "σ2": 1.0}, log_vars=["r"])
    # Natural-space delta of 1.0: stored natural, standardized view = Δ/σ_x = 0.5
    pa = make_deltas_parray(stdzr=stdzr, scale="natural", x=[1.0, None])
    vals = pa["x"].values()
    assert vals.shape == (2, 1)
    assert np.isclose(vals[0, 0], 1.0)
    assert np.isnan(vals[1, 0])
    assert np.isclose(pa["x"].z.values()[0, 0], 0.5)

    # Standardized-scale input round-trips through natural space
    pa2 = make_deltas_parray(stdzr=stdzr, scale="standardized", x=[0.5])
    assert np.isclose(pa2["x"].z.values()[0, 0], 0.5)


def test_isotropic_vars_share_moments():
    import pandas as pd

    df = pd.DataFrame(
        {
            "a": np.random.default_rng(0).normal(0, 1, 50),
            "b": np.random.default_rng(1).normal(5, 3, 50),
        }
    )
    s = Standardizer.from_DataFrame(df, isotropic_vars=["a", "b"])
    assert s["a"] == s["b"]  # pooled moments
    s2 = Standardizer.from_DataFrame(df)
    assert s2["a"] != s2["b"]


def test_misc_utils():
    assert one([3]) == 3
    with pytest.raises(Exception):
        one([1, 2])
    assert flatten([[1, 2], [3]]) == [1, 2, 3]
    assert list(batched(range(5), 2)) == [(0, 1), (2, 3), (4,)]
    assert group_by(["aa", "ab", "ba"], lambda s: s[0]) == {"a": ["aa", "ab"], "b": ["ba"]}
    assert np.isclose(float(round_to_n(0.01234, 2)), 0.012)

    class Counter:
        calls = 0
        watched = Trigger("bump")

        def bump(self):
            Counter.calls += 1

    c = Counter()
    c.watched = 5
    assert Counter.calls == 1 and c.watched == 5

    class Base:
        pass

    class Copyish(InstanceCopy, Base):
        pass

    parent = Base()
    parent.x = 42
    child = Copyish(parent)
    assert child.x == 42


def test_savefig_and_paths(tmp_path, monkeypatch):
    import matplotlib.pyplot as plt

    from gumbi_tpu.utils import savefig, setup_paths

    monkeypatch.chdir(tmp_path / "Code" if (tmp_path / "Code").mkdir() is None else tmp_path)
    base, code, data, rslt, figs = setup_paths(make_missing=True)
    assert data.exists() and figs.exists()

    plt.plot([0, 1], [0, 1])
    savefig("test_fig", path=figs, silent=True)
    assert (figs / "test_fig.png").exists()
    assert (figs / "test_fig.svg").exists()
    plt.close("all")
