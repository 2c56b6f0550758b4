"""Analytic-solution fixture problems (reference test_models/)."""

from . import (  # noqa: F401
    exponential_decay,
    exponential_decay_algebraic,
    foodweb,
    heat1d,
    heat2d,
    logistic,
    misc,
    robertson,
)
