"""Drop-in import compatibility with the reference package layout.

A user of ``mhealth`` (callumstew/pymhealth) can switch
``import mhealth.X.Y`` → ``import pymhealth_ray.mhealth_compat.X.Y`` and run
the same call chains: every public function of the reference is re-exported
from the engine's kernel library under its original module path, including
the pandas-DataFrame dispatch wrappers. Semantics notes and recorded
divergences: SURVEY.md §8.
"""

from pymhealth_ray.mhealth_compat import generic, util, heart, inertial, location, fft  # noqa: F401
