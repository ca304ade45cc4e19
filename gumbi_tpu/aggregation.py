"""Tabular data layer: per-variable transforms, standardization, wide/tidy views.

Host-side (pandas/numpy) front-end of the TPU-native stack. Behavioral parity
with the reference tabular layer (reference gumbi/aggregation.py:17-956); all
heavy numerics downstream consume the frozen moment/transform registry that
:class:`Standardizer` provides.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from scipy.special import expit, logit

from .utils import listify, skip

__all__ = ["Standardizer", "TidyData", "WideData", "DataSet"]

# Forward/inverse transform pairs. ``skip`` is the identity sentinel; the
# structured-array layer compares against these exact function objects.
_TRANSFORM_PAIRS = {
    "identity": (skip, skip),
    "log": (np.log, np.exp),
    "logit": (logit, expit),
}


class Standardizer(dict):
    r"""Per-variable transform registry plus transformed-space moments (μ, σ2).

    Maps values of each named variable between three spaces:

    * natural      — the units the data arrived in
    * transformed  — after the variable's forward transform (log / logit / identity)
    * standardized — transformed, mean-centered, and scaled to unit variance

    The mapping for a value ``x`` of variable ``v`` is
    ``z = (f_v(x) - μ_v) / σ_v`` with ``f_v`` the registered forward transform
    and ``(μ_v, σ2_v)`` the stored moments *of the transformed variable*.

    Moments are supplied as keyword arguments (``v={'μ': m, 'σ2': s2}`` or
    ``{'μ': m, 'σ': s}``) or estimated from a wide DataFrame via
    :meth:`from_DataFrame`. Distribution (μ, σ2) pairs are converted between
    spaces following scipy's lognorm/logit-normal conventions: the "mean" moves
    through the transform while the variance is interpreted as the
    transformed-space variance and passes through unchanged.

    Parity: reference gumbi/aggregation.py:17-485.
    """

    def __init__(self, log_vars=None, logit_vars=None, isotropic_vars=None, **kwargs):
        self.validate(kwargs)
        cleaned = {}
        for name, stats in kwargs.items():
            stats = dict(stats)
            if "σ2" not in stats:
                stats["σ2"] = stats.pop("σ") ** 2
            cleaned[name] = stats
        super().__init__(**cleaned)

        self._transforms = {var: list(_TRANSFORM_PAIRS["identity"]) for var in cleaned}
        self._log_vars = []
        self._logit_vars = []
        self._isotropic_vars = listify(isotropic_vars)
        if log_vars is not None:
            self.log_vars = log_vars
        if logit_vars is not None:
            self.logit_vars = logit_vars

    # ------------------------------------------------------------------
    # Registry management
    # ------------------------------------------------------------------

    @property
    def log_vars(self) -> list:
        """Variables treated as log-normal."""
        return self._log_vars

    @log_vars.setter
    def log_vars(self, var_list):
        var_list = [var_list] if isinstance(var_list, str) else var_list
        if not isinstance(var_list, list):
            raise TypeError("log_vars must be a list or str")
        self._log_vars = var_list
        for var in var_list:
            self._transforms[var] = list(_TRANSFORM_PAIRS["log"])

    @property
    def logit_vars(self) -> list:
        """Variables treated as logit-normal."""
        return self._logit_vars

    @logit_vars.setter
    def logit_vars(self, var_list):
        var_list = [var_list] if isinstance(var_list, str) else var_list
        if not isinstance(var_list, list):
            raise TypeError("logit_vars must be a list or str")
        self._logit_vars = var_list
        for var in var_list:
            self._transforms[var] = list(_TRANSFORM_PAIRS["logit"])

    @property
    def transforms(self) -> dict:
        """Forward/inverse transform pair for each variable."""
        return self._transforms

    @transforms.setter
    def transforms(self, dct):
        # Copy: assigning a dict shared with another Standardizer (e.g. the
        # result of `a | b`) must not alias their registries — later
        # log_vars/logit_vars edits on one would silently retune the other.
        self._transforms = {k: list(v) for k, v in dct.items()}
        self._log_vars = [v for v, pair in dct.items() if pair[0] is np.log]
        self._logit_vars = [v for v, pair in dct.items() if pair[0] is logit]

    @classmethod
    def validate(cls, dct: dict):
        """Ensure every entry carries a mean and a variance (or sd)."""
        assert all("μ" in sub for sub in dct.values())
        assert all(("σ" in sub or "σ2" in sub) for sub in dct.values())

    def __or__(self, other) -> Standardizer:
        merged = {**self, **other}
        new = Standardizer(**merged)
        if isinstance(other, Standardizer):
            new.transforms = {**self.transforms, **other.transforms}
        else:
            new.transforms = self.transforms
        return new

    def __ror__(self, other) -> Standardizer:
        merged = {**other, **self}
        new = Standardizer(**merged)
        new.transforms = self.transforms
        return new

    def __repr__(self):
        head = "\n\t".join(
            ["Standardizer:", f"log_vars: {self.log_vars}", f"logit_vars: {self.logit_vars}"]
        )
        return head + "\n\n" + str({**self})

    @classmethod
    def from_DataFrame(cls, df: pd.DataFrame, log_vars=None, logit_vars=None, isotropic_vars=None):
        """Estimate transformed-space moments of every float64 column of ``df``.

        Anisotropic columns get independent (pandas sample) moments; columns in
        ``isotropic_vars`` share pooled (numpy population) moments, as in the
        reference (gumbi/aggregation.py:224-258).
        """
        isotropic_vars = listify(isotropic_vars)
        float_cols = [c for c in df.columns if df[c].dtype == "float64"]
        anis_cols = [c for c in float_cols if c not in isotropic_vars]

        new = cls(log_vars=log_vars, logit_vars=logit_vars)

        anis_dct = {}
        if anis_cols:
            anis_dct = (
                df[anis_cols]
                .apply(new.transform)
                .agg(["mean", "var"])
                .rename(index={"mean": "μ", "var": "σ2"})
                .to_dict()
            )

        iso_dct = {}
        if isotropic_vars:
            pooled = df[isotropic_vars].apply(new.transform).values
            iso_dct = {
                col: {"μ": pooled.mean(), "σ2": pooled.var()} for col in isotropic_vars
            }

        return new | anis_dct | iso_dct

    # ------------------------------------------------------------------
    # Space conversions — values, (μ, σ2) distributions, and pd.Series
    # ------------------------------------------------------------------

    def _dispatch(self, value_fn, dist_fn, name, μ, σ2):
        if isinstance(name, pd.Series):
            return value_fn(name.name, name)
        if μ is None:
            raise ValueError("μ cannot be None")
        if σ2 is None:
            return value_fn(name, μ)
        return dist_fn(name, μ, σ2)

    def transform(self, name, μ=None, σ2=None):
        """Natural → transformed for a value, (μ, σ2) pair, or Series."""
        if isinstance(name, pd.Series):
            return self._transform_value(name.name, name)
        if μ is None:
            raise ValueError("μ cannot be None")
        return self._dispatch(self._transform_value, self._transform_dist, name, μ, σ2)

    def untransform(self, name, μ=None, σ2=None):
        """Transformed → natural for a value, (μ, σ2) pair, or Series."""
        if isinstance(name, pd.Series):
            return self._untransform_value(name.name, name)
        if σ2 is None:
            return self._untransform_value(name, μ)
        return self._untransform_dist(name, μ, σ2)

    def stdz(self, name, μ=None, σ2=None):
        """Natural → standardized for a value, (μ, σ2) pair, or Series."""
        return self._dispatch(self._stdz_value, self._stdz_dist, name, μ, σ2)

    def unstdz(self, name, μ=None, σ2=None):
        """Standardized → natural for a value, (μ, σ2) pair, or Series."""
        if isinstance(name, pd.Series):
            return self._unstdz_value(name.name, name)
        if σ2 is None:
            return self._unstdz_value(name, μ)
        return self._unstdz_dist(name, μ, σ2)

    # -- value-space internals ------------------------------------------------

    def _fwd(self, name):
        return self.transforms.get(name, _TRANSFORM_PAIRS["identity"])[0]

    def _inv(self, name):
        return self.transforms.get(name, _TRANSFORM_PAIRS["identity"])[1]

    def _moments(self, name):
        μ = self.get(name, {"μ": 0})["μ"]
        σ2 = self.get(name, {"σ2": 1})["σ2"]
        return μ, σ2

    def _transform_value(self, name, x):
        return self._fwd(name)(x)

    def _untransform_value(self, name, x):
        return self._inv(name)(x)

    def _stdz_value(self, name, x):
        μ, σ2 = self._moments(name)
        x_t = self.transform(name, x)
        if isinstance(x_t, (list, tuple)):  # identity transform leaves lists as-is
            x_t = np.asarray(x_t)
        return np.divide(x_t - μ, np.sqrt(σ2))

    def _unstdz_value(self, name, z):
        μ, σ2 = self._moments(name)
        return self.untransform(name, np.multiply(z, np.sqrt(σ2)) + μ)

    # -- distribution-space internals ------------------------------------------
    #
    # Following scipy conventions (reference gumbi/aggregation.py:402-448): a
    # lognorm(scale=μ, s=σ) in natural space is norm(loc=log μ, scale=σ) in log
    # space — the "mean" descriptor moves through the transform, the variance
    # (transformed-space variance) is unchanged.

    @property
    def mean_transforms(self):
        """Distribution-mean conversion rules keyed by forward transform."""
        return {
            skip: [lambda μ, σ2: μ, lambda μ, σ2: μ],
            np.log: [lambda μ, σ2: np.log(μ), lambda μ, σ2: np.exp(μ)],
            logit: [lambda μ, σ2: logit(μ), lambda μ, σ2: expit(μ)],
        }

    @property
    def var_transforms(self):
        """Distribution-variance conversion rules keyed by forward transform."""
        passthrough = [lambda μ, σ2: σ2, lambda μ, σ2: σ2]
        return {skip: passthrough, np.log: passthrough, logit: passthrough}

    def _transform_dist(self, name, mean, var):
        f = self._fwd(name)
        return self.mean_transforms[f][0](mean, var), self.var_transforms[f][0](mean, var)

    def _untransform_dist(self, name, mean, var):
        f = self._fwd(name)
        return self.mean_transforms[f][1](mean, var), self.var_transforms[f][1](mean, var)

    def _stdz_dist(self, name, mean, var):
        mean_t, var_t = self.transform(name, mean, var)
        μ, σ2 = self._moments(name)
        return (mean_t - μ) / np.sqrt(σ2), var_t / σ2

    def _unstdz_dist(self, name, z_mean, z_var):
        μ, σ2 = self._moments(name)
        return self.untransform(name, z_mean * np.sqrt(σ2) + μ, z_var * σ2)


class MetaFrame(pd.DataFrame):
    """Shared machinery for :class:`WideData` and :class:`TidyData`.

    A DataFrame subclass that carries a :class:`Standardizer` and output/column
    configuration, exposing standardized (``.z``) and transformed (``.t``)
    views. Slicing degrades to a plain ``pd.DataFrame`` by design.

    Parity: reference gumbi/aggregation.py:488-589.
    """

    _metadata = [
        "outputs",
        "log_vars",
        "logit_vars",
        "isotropic_vars",
        "names_column",
        "values_column",
        "stdzr",
    ]

    def __init__(
        self,
        df=None,
        outputs=None,
        log_vars=None,
        logit_vars=None,
        isotropic_vars=None,
        names_column="Variable",
        values_column="Value",
        stdzr=None,
        **pd_kwargs,
    ):
        super().__init__(self._coerce_df(df, outputs, names_column, values_column), **pd_kwargs)
        self.outputs = outputs
        self.log_vars = log_vars
        self.logit_vars = logit_vars
        self.isotropic_vars = isotropic_vars
        self.names_column = names_column
        self.values_column = values_column
        if stdzr is None:
            stdzr = Standardizer.from_DataFrame(
                self, log_vars=log_vars, logit_vars=logit_vars, isotropic_vars=isotropic_vars
            )
        else:
            self.log_vars = stdzr.log_vars
            self.logit_vars = stdzr.logit_vars
        self.stdzr = stdzr

    @classmethod
    def _coerce_df(cls, df, outputs, names_column, values_column):
        """Hook allowing subclasses to reshape the incoming (wide) frame."""
        return df

    @property
    def _constructor(self):
        # Slices and copies return a plain DataFrame rather than attempting to
        # rebuild the metadata-carrying subclass.
        return pd.DataFrame

    def __repr__(self):
        head = "\n\t".join(
            [f"{self.__class__.__name__}:", f"outputs: {self.outputs}", f"inputs: {self.inputs}"]
        )
        return head + "\n\n" + super().__repr__()

    @property
    def z(self) -> pd.DataFrame:
        """Standardized data values."""
        raise NotImplementedError

    @property
    def t(self) -> pd.DataFrame:
        """Transformed data values."""
        raise NotImplementedError

    @property
    def specs(self) -> dict:
        """Keyword arguments to construct a similar object."""
        return dict(
            outputs=self.outputs,
            names_column=self.names_column,
            values_column=self.values_column,
            stdzr=self.stdzr,
            log_vars=self.log_vars,
            logit_vars=self.logit_vars,
        )

    @property
    def inputs(self) -> list:
        """Columns not listed as outputs."""
        return [col for col in self.columns if col not in self.outputs]

    @property
    def float_inputs(self) -> list:
        """Input columns with float64 dtype."""
        return [col for col in self.inputs if self[col].dtype == "float64"]

    @classmethod
    def _wide_to_tidy_(cls, wide, outputs, names_column="Variable", values_column="Value"):
        inputs = [col for col in wide.columns if col not in outputs]
        return wide.melt(
            id_vars=inputs, value_vars=outputs, var_name=names_column, value_name=values_column
        )

    @classmethod
    def _tidy_to_wide_(cls, tidy, names_column="Variable", values_column="Value"):
        inputs = [col for col in tidy.columns if col not in (names_column, values_column)]
        return (
            tidy.pivot(index=inputs, columns=names_column, values=values_column)
            .reset_index()
            .rename_axis(columns=None)
        )


class WideData(MetaFrame):
    """Wide-form container: one row per observation, one column per output.

    Constructed from a wide-form DataFrame; prefer :class:`DataSet` for user
    code. Parity: reference gumbi/aggregation.py:592-668.
    """

    @property
    def z(self) -> pd.DataFrame:
        df_ = self.copy()
        cols = self.outputs + self.float_inputs
        df_[cols] = df_[cols].apply(self.stdzr.stdz)
        return df_

    @property
    def t(self) -> pd.DataFrame:
        df_ = self.copy()
        cols = self.outputs + self.float_inputs
        df_[cols] = df_[cols].apply(self.stdzr.transform)
        return df_

    def to_tidy(self) -> TidyData:
        """Melt into the tidy view."""
        return TidyData(self, **self.specs)

    @classmethod
    def from_tidy(
        cls,
        tidy,
        outputs=None,
        names_column="Variable",
        values_column="Value",
        stdzr=None,
        log_vars=None,
        logit_vars=None,
    ):
        """Pivot a tidy-form frame into a :class:`WideData`."""
        outputs = outputs if outputs is not None else list(tidy[names_column].unique())
        wide = cls._tidy_to_wide_(tidy, names_column=names_column, values_column=values_column)
        return cls(
            wide,
            outputs=outputs,
            names_column=names_column,
            values_column=values_column,
            stdzr=stdzr,
            log_vars=log_vars,
            logit_vars=logit_vars,
        )


class TidyData(MetaFrame):
    """Tidy-form container: output names/values as two long columns.

    Note: constructed from a **wide-form** DataFrame (melted internally), for
    symmetry with :class:`WideData`. Parity: reference gumbi/aggregation.py:671-743.
    """

    @classmethod
    def _coerce_df(cls, df, outputs, names_column, values_column):
        return cls._wide_to_tidy_(
            df, outputs=outputs, names_column=names_column, values_column=values_column
        )

    def _wide_view(self) -> WideData:
        wide = self._tidy_to_wide_(self, names_column=self.names_column, values_column=self.values_column)
        return WideData(wide, **self.specs)

    @property
    def z(self) -> pd.DataFrame:
        wd = self._wide_view()
        return self._wide_to_tidy_(
            wd.z, outputs=self.outputs, names_column=self.names_column, values_column=self.values_column
        )

    @property
    def t(self) -> pd.DataFrame:
        wd = self._wide_view()
        return self._wide_to_tidy_(
            wd.t, outputs=self.outputs, names_column=self.names_column, values_column=self.values_column
        )

    def to_wide(self) -> WideData:
        """Pivot back into the wide view."""
        return self._wide_view()


class DataSet:
    """User-facing container pairing a wide-form DataFrame with a Standardizer.

    Provides ``.wide`` / ``.tidy`` views (:class:`WideData` / :class:`TidyData`)
    which in turn expose ``.z`` / ``.t`` standardized and transformed values.
    The Standardizer is built automatically from the data unless supplied.

    Parity: reference gumbi/aggregation.py:746-956.

    Parameters
    ----------
    data : pd.DataFrame
        Wide-form data (see :meth:`from_tidy` for tidy input).
    outputs : list
        Columns to treat as outputs.
    names_column, values_column : str
        Column titles used in the tidy view.
    log_vars, logit_vars : list, optional
        Variables treated as log-/logit-normal (ignored if ``stdzr`` given).
    stdzr : Standardizer, optional
    """

    def __init__(
        self,
        data: pd.DataFrame,
        outputs: list,
        names_column: str = "Variable",
        values_column: str = "Value",
        log_vars: list = None,
        logit_vars: list = None,
        isotropic_vars: list = None,
        stdzr: Standardizer = None,
    ):
        self.data = data
        self.outputs = outputs
        self.names_column = names_column
        self.values_column = values_column
        self.log_vars = log_vars
        self.logit_vars = logit_vars
        self.isotropic_vars = isotropic_vars
        self.stdzr = stdzr
        if self.stdzr is None:
            self.stdzr = Standardizer.from_DataFrame(
                self.wide,
                log_vars=self.log_vars,
                logit_vars=self.logit_vars,
                isotropic_vars=self.isotropic_vars,
            )
        else:
            self.log_vars = self.stdzr.log_vars
            self.logit_vars = self.stdzr.logit_vars

    def __repr__(self):
        wide_shape = "[{0} rows x {1} columns]".format(*self.wide.shape)
        tidy_shape = "[{0} rows x {1} columns]".format(*self.tidy.shape)
        return "\n\t".join(
            [
                "DataSet:",
                f"wide: {wide_shape}",
                f"tidy: {tidy_shape}",
                f"outputs: {self.outputs}",
                f"inputs: {self.inputs}",
            ]
        )

    @property
    def specs(self) -> dict:
        """Keyword arguments to construct a similar DataSet."""
        return dict(
            outputs=self.outputs,
            names_column=self.names_column,
            values_column=self.values_column,
            stdzr=self.stdzr,
            log_vars=self.log_vars,
            logit_vars=self.logit_vars,
        )

    @property
    def inputs(self) -> list:
        """Columns not listed as outputs."""
        return [col for col in self.wide.columns if col not in self.outputs]

    @property
    def float_inputs(self) -> list:
        """Input columns with float64 dtype."""
        return [col for col in self.inputs if self.wide[col].dtype == "float64"]

    @property
    def wide(self) -> WideData:
        """Wide-form view of the data."""
        return WideData(self.data, **self.specs)

    @wide.setter
    def wide(self, wide_df: pd.DataFrame):
        assert any(
            output in wide_df.columns for output in self.outputs
        ), f"Dataframe must have at least one of outputs {self.outputs}"
        self.data = wide_df

    @property
    def tidy(self) -> TidyData:
        """Tidy-form view of the data."""
        return TidyData(self.data, **self.specs)

    @tidy.setter
    def tidy(self, tidy_df: pd.DataFrame):
        assert all(
            col in tidy_df.columns for col in (self.names_column, self.values_column)
        ), f"Dataframe must have both columns {[self.names_column, self.values_column]}"
        self.wide = WideData.from_tidy(tidy_df, **self.specs)

    @classmethod
    def from_tidy(
        cls,
        tidy,
        outputs=None,
        names_column="Variable",
        values_column="Value",
        stdzr=None,
        log_vars=None,
        logit_vars=None,
    ):
        """Construct from a tidy-form DataFrame."""
        assert all(
            col in tidy.columns for col in (names_column, values_column)
        ), f"Dataframe must have both columns {[names_column, values_column]}"
        wide = WideData.from_tidy(
            tidy,
            outputs=outputs,
            names_column=names_column,
            values_column=values_column,
            stdzr=stdzr,
            log_vars=log_vars,
            logit_vars=logit_vars,
        )
        return cls(pd.DataFrame(wide), **wide.specs)

    @classmethod
    def from_wide(
        cls,
        wide,
        outputs=None,
        names_column="Variable",
        values_column="Value",
        stdzr=None,
        log_vars=None,
        logit_vars=None,
    ):
        """Construct from a wide-form DataFrame."""
        return cls(
            wide,
            outputs=outputs,
            names_column=names_column,
            values_column=values_column,
            stdzr=stdzr,
            log_vars=log_vars,
            logit_vars=logit_vars,
        )

    def update_stdzr(self):
        """Refresh the Standardizer from the current data and transform lists."""
        self.stdzr.update(
            Standardizer.from_DataFrame(
                self.wide,
                log_vars=self.log_vars,
                logit_vars=self.logit_vars,
                isotropic_vars=self.isotropic_vars,
            )
        )
