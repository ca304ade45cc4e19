"""Structured array behavior with golden values from the reference test suite
(reference tests/test_arrays.py — pure math, transfers verbatim)."""

import numpy as np

import gumbi_tpu as gmb
from gumbi_tpu import Standardizer, mvuparray, parray, uarray, uparray

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


def test_parray():
    stdzr = Standardizer(**example_stdzr, log_vars=log_vars, logit_vars=logit_vars)

    rpa = parray(d=np.arange(5, 10) / 10, stdzr=stdzr)
    assert np.allclose(rpa, np.arange(5, 10) / 10)
    assert np.allclose(rpa.values(), np.arange(5, 10) / 10)
    assert np.allclose(
        rpa.t, [-0.69314718, -0.51082562, -0.35667494, -0.22314355, -0.10536052]
    )
    assert np.allclose(rpa.z, [-2.4439695, -1.29003559, -0.31439838, 0.53073702, 1.27619927])

    # Composition with numpy functions
    assert np.allclose(np.min(np.sqrt(np.mean(np.square(rpa - rpa[0] - 0.05)))).t, -1.5791256)
    assert np.argmax(rpa.values()) == 4

    # Parameter not found in stdzr → all three spaces identical
    pa1 = parray(param=np.arange(5), stdzr=stdzr)
    assert np.allclose(pa1, np.arange(5))
    assert np.allclose(pa1.t, np.arange(5))
    assert np.allclose(pa1.z, np.arange(5))

    # Multiple parameters
    pa2 = parray(param=np.arange(5), other=np.arange(5) * 10, stdzr=stdzr)
    assert np.allclose(pa2.get("param").values(), [0.0, 1.0, 2.0, 3.0, 4.0])
    assert np.allclose(pa2.get("other").values(), [0.0, 10.0, 20.0, 30.0, 40.0])
    assert pa2.values().shape == (2, 5)

    # Indexing and slicing
    assert pa1[0].values() == 0
    assert np.allclose(pa1[::2].values(), [0, 2, 4])
    assert np.allclose(pa2[::2].get("param").values(), [0, 2, 4])


def test_parray_stdzd_roundtrip():
    stdzr = Standardizer(**example_stdzr, log_vars=log_vars, logit_vars=logit_vars)
    z_vals = np.array([-1.0, 0.0, 1.0])
    pa = parray(d=z_vals, stdzr=stdzr, stdzd=True)
    assert np.allclose(pa.z.values(), z_vals)


def test_uarray():
    ua1 = uarray("A", μ=1, σ2=0.1)
    ua2 = uarray("A", μ=2, σ2=0.2)

    ua3 = ua1 + 1
    assert np.isclose(ua3.μ, 2.0)
    assert np.isclose(ua3.σ2, 0.1)
    assert np.isclose(ua3.σ, 0.3162277660)

    ua4 = ua2 + ua1
    assert np.isclose(ua4.μ, 3.0)
    assert np.isclose(ua4.σ2, 0.3)

    ua5 = ua2 - ua1
    assert np.isclose(ua5.μ, 1.0)
    assert np.isclose(ua5.σ2, 0.3)

    ua6 = uarray.stack([ua1, ua2]).mean(axis=0)
    assert np.isclose(ua6.μ, 1.5)
    assert np.isclose(ua6.σ2, 0.075)

    ua7 = uarray("B", np.arange(1, 5) / 10, np.arange(1, 5) / 100)
    assert np.isclose(ua7.mean().μ, 0.25)
    assert np.isclose(ua7.mean().σ2, 0.00625)

    ua8 = ua1 + ua7.mean()
    assert ua8.name == "(A+B)"
    assert np.isclose(ua8.μ, 1.25)
    assert np.isclose(ua8.σ2, 0.10625)

    # Distribution views
    assert np.allclose(ua7.dist.ppf(0.95), [0.26448536, 0.43261743, 0.58489701, 0.72897073])
    rvs = ua7.dist.rvs([3, *ua7.shape], random_state=2021)
    targets = np.array(
        [
            [0.24886091, 0.29560237, 0.2275221, 0.23869584],
            [0.15558758, 0.10022663, 0.4958704, 0.52900037],
            [0.11064137, 0.25970171, 0.32151326, 0.23240931],
        ]
    )
    assert np.allclose(rvs, targets)


def test_uarray_mul_div():
    ua1 = uarray("A", μ=2.0, σ2=0.1)
    ua2 = uarray("A", μ=4.0, σ2=0.2)
    prod = ua1 * ua2
    assert np.isclose(prod.μ, 8.0)
    assert np.isclose(prod.σ2, 16 * 0.1 + 4 * 0.2)  # first-order propagation
    quot = ua1 / ua2
    assert np.isclose(quot.μ, 0.5)
    assert np.isclose(quot.σ2, 0.1 / 16 + 4 / 256 * 0.2)
    scaled = ua1 * 3
    assert np.isclose(scaled.μ, 6.0)
    assert np.isclose(scaled.σ2, 0.9)


def test_uparray():
    stdzr = Standardizer(**example_stdzr, log_vars=log_vars, logit_vars=logit_vars)

    upa = uparray("c", np.arange(1, 5) / 10, np.arange(1, 5) / 100, stdzr)
    assert np.allclose(upa.μ, np.arange(1, 5) / 10)
    assert np.allclose(upa.σ2, np.arange(1, 5) / 100)

    # Round-trip transformation
    rt_μ, rt_σ2 = upa.stdzr.unstdz(upa.name, upa.z.μ, upa.z.σ2)
    assert np.allclose(upa.μ, rt_μ)
    assert np.allclose(upa.σ2, rt_σ2)

    upa2 = uparray(upa.name, upa.z.μ, upa.z.σ2, stdzr, stdzd=True)
    assert np.allclose(upa.μ, upa2.μ)
    assert np.allclose(upa.σ2, upa2.σ2)
    assert np.allclose(upa.z.μ, upa2.z.μ)
    assert np.allclose(upa.z.σ2, upa2.z.σ2)

    # Lognormal mean semantics: averaging happens in transformed space
    assert np.isclose(upa.mean().μ, 0.22133638)
    assert np.isclose(upa.mean().σ2, 0.00625)
    analytical_mean = upa.mean().dist.mean()
    mc_mean = np.exp(upa.t.mean().dist.rvs(10000, random_state=2021).mean())
    assert np.isclose(analytical_mean, mc_mean, atol=0.01)
    mc_var = np.log(upa.mean().dist.rvs(10000, random_state=2021)).var()
    assert np.isclose(upa.mean().σ2, mc_var, atol=1e-4)

    # Distribution behavior
    assert np.allclose(upa.dist.ppf(0.025), [0.08220152, 0.1515835, 0.21364308, 0.27028359])
    assert np.allclose(upa.dist.ppf(0.975), [0.12165225, 0.26388097, 0.42126336, 0.59197082])
    rvs = upa.dist.rvs([3, *upa.shape], random_state=2021)
    target = np.array(
        [
            [0.11605116, 0.22006429, 0.27902589, 0.34041327],
            [0.10571616, 0.1810085, 0.36491077, 0.45507622],
            [0.10106982, 0.21230397, 0.3065239, 0.33827997],
        ]
    )
    assert np.allclose(rvs, target)


def test_mvuparray():
    stdzr = Standardizer(**example_stdzr, log_vars=log_vars, logit_vars=logit_vars)
    c_μ = np.arange(1, 5) / 10
    c_σ2 = np.arange(1, 5) / 100
    r_μ = c_μ + 0.5
    r_σ2 = c_σ2 / 100 * 2
    c_upa = uparray("c", c_μ, c_σ2, stdzr)
    r_upa = uparray("d", r_μ, r_σ2, stdzr)
    cor = np.array([[1, -0.6], [-0.6, 1]])
    mvup = mvuparray(c_upa, r_upa, cor=cor)

    # Construction
    assert np.allclose(mvup.μ.values(), np.stack([c_μ, r_μ]))
    assert np.allclose(mvup.get("d").μ, r_μ)
    assert np.allclose(mvup.t.get("d_t").μ, r_upa.t.μ)
    assert np.allclose(mvup.t.μ["d_t"], r_upa.t.μ)
    assert np.allclose(mvup.z.μ["d_z"], r_upa.z.μ)

    # Distribution behavior (golden values from reference tests/test_arrays.py:172-181)
    pa = mvup.parray(c=0.09, d=0.61)
    assert np.isclose(mvup[0].dist.cdf(pa), 0.0889634198684274)
    assert np.isclose(mvup[0].t.dist.cdf(pa), 0.0889634198684274)
    assert np.isclose(mvup[0].z.dist.cdf(pa), 0.0889634198684274)
    mvup[0].dist.cdf(mvup.μ)  # runs without error

    rvs = mvup[0].dist.rvs(2, random_state=2021)
    assert np.allclose(rvs["d"].values(), [0.61310678, 0.59268474])
    assert np.allclose(rvs["c"].values(), [0.08709257, 0.10308707])


def test_mvuparray_mahalanobis():
    stdzr = Standardizer(**example_stdzr, log_vars=log_vars, logit_vars=logit_vars)
    c_upa = uparray("c", np.array(0.2), np.array(0.02), stdzr)
    r_upa = uparray("d", np.array(0.7), np.array(0.002), stdzr)
    cor = np.array([[1.0, 0.3], [0.3, 1.0]])
    mvup = mvuparray(c_upa, r_upa, cor=cor)
    pa = mvup.parray(c=0.2, d=0.7)
    assert np.isclose(mvup.mahalanobis(pa), 0.0, atol=1e-8)
    assert np.isclose(mvup.outlier_pval(pa), 1.0)


def test_stack_utils():
    stdzr = Standardizer(**example_stdzr, log_vars=log_vars, logit_vars=logit_vars)
    pa1 = parray(param=np.arange(5), other=np.arange(5) * 10, stdzr=stdzr)
    pa2 = parray(param=np.arange(5), other=np.arange(5) * 10, stdzr=stdzr)

    pa_out = gmb.stack([pa1, pa2])
    assert np.allclose(pa_out.get("param").values(), [0, 1, 2, 3, 4, 0, 1, 2, 3, 4])
    assert isinstance(pa_out, parray)

    pa_out = gmb.hstack([pa1, pa2])
    assert np.allclose(pa_out.get("param").values(), [0, 1, 2, 3, 4, 0, 1, 2, 3, 4])
    assert isinstance(pa_out, parray)

    pa_out = gmb.hstack([pa1[:, None], pa2[:, None]])
    assert np.allclose(
        pa_out.get("param").values(), np.array([[0, 1, 2, 3, 4], [0, 1, 2, 3, 4]]).T
    )
    assert isinstance(pa_out, parray)

    pa_out = gmb.vstack([pa1[:, None], pa2[:, None]])
    assert np.allclose(
        pa_out.get("param").values(), np.array([[0, 1, 2, 3, 4, 0, 1, 2, 3, 4]]).T
    )
    assert isinstance(pa_out, parray)


def test_reserved_column_names():
    """Columns named after constructor parameters ('cls') must not collide.

    The class argument in LayeredArray/ParameterArray/UncertainArray __new__
    is positional-only (`cls, /`), so a data column named "cls" lands in
    **arrays instead of shadowing the class object.
    """
    stdzr = Standardizer(**example_stdzr, log_vars=log_vars, logit_vars=logit_vars)

    la = gmb.LayeredArray(cls=np.arange(3))
    assert np.allclose(la.get("cls").values(), [0, 1, 2])

    pa = parray(cls=np.arange(3), stdzr=stdzr)
    assert np.allclose(pa.get("cls").values(), [0, 1, 2])

    ua = uarray("cls", np.zeros(3), np.ones(3))
    assert ua.name == "cls"


def test_ufunc_out_writes_through():
    """np.add(..., out=target) must actually write into the target's buffer
    (the out= argument was previously dropped silently)."""
    la = gmb.LayeredArray(a=np.array([1.0, 2.0]))
    target = gmb.LayeredArray(a=np.zeros(2))
    res = np.add(la, 1.0, out=target)
    assert np.allclose(target.get("a").values(), [2.0, 3.0])
    assert res is target


def test_mvuparray_get_subset():
    stdzr = Standardizer(**example_stdzr, log_vars=log_vars, logit_vars=logit_vars)
    cor = np.array([[1.0, 0.5, 0.2], [0.5, 1.0, 0.1], [0.2, 0.1, 1.0]])
    ups = [uparray(n, np.ones(4) * (i + 1), np.ones(4) * 0.1, stdzr) for i, n in enumerate("dcf")]
    mv = mvuparray(*ups, cor=cor)
    sub = mv.get(["d", "f"])
    assert list(sub.names) == ["d", "f"]
    assert np.allclose(sub.cor, cor[np.ix_([0, 2], [0, 2])])


def test_standardizer_merge_does_not_alias_transforms():
    stdzr = Standardizer(**example_stdzr, log_vars=log_vars, logit_vars=logit_vars)
    merged = stdzr | {"new_var": {"μ": 1.0, "σ2": 4.0}}
    before = {k: list(v) for k, v in stdzr.transforms.items()}
    merged.log_vars = list(merged.log_vars) + ["a"]
    after = {k: list(v) for k, v in stdzr.transforms.items()}
    assert before == after, "merging then editing the result mutated the original"
