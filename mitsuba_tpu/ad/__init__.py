"""Differentiable-rendering layer (reference: src/python/python/ad/*)."""
from .optimizers import Adam, SGD, Optimizer
from .prb import PRBIntegrator
