"""Regression models: the JAX GP surface learner and classifier."""

__all__ = []
