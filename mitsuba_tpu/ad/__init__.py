"""Differentiable-rendering layer (reference: src/python/python/ad/*)."""
from .optimizers import Adam, SGD, Optimizer
from .prb import PRBIntegrator
from .prbvolpath import PRBVolpathIntegrator
from .largesteps import LargeSteps
