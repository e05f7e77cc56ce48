"""reference:src/mhealth/heart/ppg.py surface."""
from pymhealth_ray.functions.heart import pulse_onset_physionet, physionet_decision_rule  # noqa: F401
from pymhealth_ray.functions.filters import slope_sum  # noqa: F401
