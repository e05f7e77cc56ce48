"""reference:src/mhealth/heart/qrs.py surface, including the DataFrame
dispatch (fs inferred from a datetime index in ns — reference:heart/qrs.py:102)."""
from functools import singledispatch

import numpy as np

from pymhealth_ray.functions.filters import moving_average, pt_differentiate  # noqa: F401
from pymhealth_ray.functions.heart import (  # noqa: F401
    bandpass,
    decision_rule_hamilton_tompkins,
    filter_hamilton_tompkins,
    filter_pan_tompkins,
    find_peaks,
    rpeaks_hamilton_tompkins as _np_rpeaks,
)

nb_find_peaks = find_peaks


@singledispatch
def rpeaks_hamilton_tompkins(ecg, fs=None, column=None):
    return _np_rpeaks(np.asarray(ecg, dtype=np.float64), fs)


@rpeaks_hamilton_tompkins.register(np.ndarray)
def _rpeaks_np(ecg, fs=None, column=None):
    return _np_rpeaks(ecg, fs)


try:
    import pandas as pd

    @rpeaks_hamilton_tompkins.register(pd.DataFrame)
    def _rpeaks_df(ecg, fs=None, column=None):
        column = column if column else ecg.columns[0]
        fs = fs if fs else (1e9 / (ecg.index[1] - ecg.index[0]).value)
        vals = _np_rpeaks(ecg[column].values, fs)
        return pd.DataFrame(vals, index=ecg.index[vals])
except ImportError:  # pragma: no cover
    pass
