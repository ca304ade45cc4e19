"""Regression models: the JAX GP surface learner and classifier."""

from .base import Regressor  # noqa: F401
from .gp import GP  # noqa: F401
from .gpc import GPC  # noqa: F401

__all__ = ["Regressor", "GP", "GPC"]
