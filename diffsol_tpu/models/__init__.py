"""Analytic-solution fixture problems (reference test_models/)."""

from . import exponential_decay, logistic  # noqa: F401
