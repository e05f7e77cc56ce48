"""Functional composition helpers. reference:src/mhealth/util/functional.py.

``compose``/``rcompose`` are the pipeline-step API of the reference; the
engine analog fuses composed scalar kernels into ONE map_batches stage
(see pymhealth_ray.stages.rowfeatures).
"""

from __future__ import annotations

import functools
from itertools import tee


def identity(x):
    """Identity. reference:util/functional.py:6-9."""
    return x


def count(start: int = 0, step: int = 1):
    """Infinite counter generator. reference:util/functional.py:12-23."""
    i = start
    while True:
        yield i
        i += step


def pairwise(iterable):
    """Consecutive pairs (x[i], x[i+1]) — the minimal lag-1 precedent.
    reference:util/functional.py:26-35.
    """
    a, b = tee(iterable)
    next(b, None)
    return zip(a, b)


def compose(*funcs):
    """Right-to-left composition. reference:util/functional.py:38-53."""
    return functools.reduce(lambda f, g: lambda *a, **k: f(g(*a, **k)), funcs)


def rcompose(*funcs):
    """Left-to-right composition. reference:util/functional.py:56-71."""
    return compose(*reversed(funcs))
