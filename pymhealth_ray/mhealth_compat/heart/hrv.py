"""reference:src/mhealth/heart/hrv.py surface."""
from pymhealth_ray.functions.hrv import (  # noqa: F401
    td_factor, nni_to_ms, nni_cumulative, sdnn, sdann, sdnni, pnn50, pnnx,
    rmssd, ssd, sdsd, power_band, peak_frequency, relative_power_band,
    csi_sd1, csi_sd2, lorenz_csi, lorenz_cvi, lorenz_mcsi,
)
