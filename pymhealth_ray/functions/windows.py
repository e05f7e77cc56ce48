"""Single-array window machinery — the in-memory oracle of the engine's
distributed window stage.

Semantics follow ``reference:src/mhealth/util/windows.py`` exactly (these
functions double as the conformance oracle in tests/). The distributed
counterpart is ``pymhealth_ray.stages.window``.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Sequence

import numpy as np


def view(x: np.ndarray, w: int, s: int) -> np.ndarray:
    """Zero-copy strided window matrix: ``((N - w) // s) + 1`` windows of
    size ``w`` stepping by ``s``. reference:util/windows.py:20-33.
    """
    return np.lib.stride_tricks.sliding_window_view(x, w)[::s]

def rolling_apply(func: Callable, wsize: int, wstep: int = 1) -> Callable:
    """Factory applying ``func`` to uniform count-based rolling windows.

    Window ``i`` covers ``arr[i*wstep : i*wstep + wsize]``;
    ``nw = max(0, 1 + (len - wsize) // wstep)`` (only full windows).
    reference:util/windows.py:54-95. List/dict variants fan several funcs
    over the same windows in one pass (reference:util/windows.py:98-119;
    the dict variant implements the *intended* named-dict semantics — the
    reference's ``{zip(...)}`` set is a recorded bug, SURVEY.md §2.1).
    """
    if isinstance(func, dict):
        names = list(func)
        fns = [rolling_apply(f, wsize, wstep) for f in func.values()]

        def apply_dict(arr: np.ndarray) -> Dict[str, np.ndarray]:
            return dict(zip(names, (f(arr) for f in fns)))

        return apply_dict
    if isinstance(func, (list, tuple)):
        fns = [rolling_apply(f, wsize, wstep) for f in func]

        def apply_list(arr: np.ndarray) -> List[np.ndarray]:
            return [f(arr) for f in fns]

        return apply_list

    def apply(arr: np.ndarray) -> np.ndarray:
        n = len(arr)
        nw = max(0, 1 + (n - wsize) // wstep)
        out = np.empty(nw, dtype=np.float64)
        for i in range(nw):
            out[i] = func(arr[i * wstep : i * wstep + wsize])
        return out

    return apply


def indices_rolling_apply(func: Callable, min_window_len: int = 1) -> Callable:
    """Factory applying ``func`` to explicit half-open ``[start, end)`` index
    windows; windows shorter than ``min_window_len`` yield NaN.

    Output dtype is always float64 (the reference inherits the input dtype
    and then assigns NaN — a recorded int-dtype bug, util/windows.py:149;
    the engine always emits float64). reference:util/windows.py:122-159.
    """

    def apply(indices: np.ndarray, arr: np.ndarray) -> np.ndarray:
        si, ei = indices[0], indices[1]
        n = indices.shape[1]
        out = np.full(n, np.nan, dtype=np.float64)
        for i in range(n):
            if ei[i] - si[i] >= min_window_len:
                out[i] = func(arr[si[i] : ei[i]])
        return out

    return apply


def get_indices(index: np.ndarray, wsize, wstep) -> np.ndarray:
    """Event-time window bound derivation — THE temporal semantics of the
    engine. Window-start grid ``arange(index[0], index[-1], wstep)`` (anchored
    at the first event, excludes the last), ends ``starts + wsize``; bounds
    located by ``np.searchsorted`` (side='left') → half-open ``[start, end)``
    windows over a time-sorted index. reference:util/windows.py:162-178.

    Works for int64-ns, datetime64 or float indices; ``wsize``/``wstep`` in
    the same unit.
    """
    index = np.asarray(index)
    starts = np.arange(index[0], index[-1], wstep)
    ends = starts + wsize
    si = np.searchsorted(index, starts, side="left")
    ei = np.searchsorted(index, ends, side="left")
    return np.stack([si, ei])


def window_starts(index: np.ndarray, wstep) -> np.ndarray:
    """The start-timestamp grid matching ``get_indices`` windows."""
    index = np.asarray(index)
    return np.arange(index[0], index[-1], wstep)


def nonuniform_rolling_apply(func, min_window_len: int = 1) -> Callable:
    """Event-time sliding/tumbling window aggregation =
    ``get_indices`` + ``indices_rolling_apply``. Returned callable has
    signature ``(index, arr, wsize, wstep)``.
    reference:util/windows.py:181-249. The dict variant honors
    ``min_window_len`` (the reference drops it at :248 — recorded quirk).
    """
    if isinstance(func, dict):
        inner = {k: indices_rolling_apply(f, min_window_len) for k, f in func.items()}

        def apply_dict(index, arr, wsize, wstep):
            idx = get_indices(index, wsize, wstep)
            return {k: f(idx, arr) for k, f in inner.items()}

        return apply_dict
    if isinstance(func, (list, tuple)):
        inner_list = [indices_rolling_apply(f, min_window_len) for f in func]

        def apply_list(index, arr, wsize, wstep):
            idx = get_indices(index, wsize, wstep)
            return [f(idx, arr) for f in inner_list]

        return apply_list

    inner_one = indices_rolling_apply(func, min_window_len)

    def apply(index, arr, wsize, wstep):
        return inner_one(get_indices(index, wsize, wstep), arr)

    return apply


def sessionize(ts: np.ndarray, gap) -> np.ndarray:
    """Gap-threshold session ids (0-based) over a time-sorted array: a new
    session starts whenever ``ts[i] - ts[i-1] > gap``.

    The engine's sessionizer oracle — the batch re-expression of the
    reference's location segmentation (cluster labels,
    location/distribution.py:42-55) with a deterministic gap rule instead of
    density clustering (SURVEY.md §2.8).
    """
    ts = np.asarray(ts)
    if len(ts) == 0:
        return np.zeros(0, dtype=np.int64)
    breaks = np.empty(len(ts), dtype=np.int64)
    breaks[0] = 0
    breaks[1:] = (np.diff(ts) > gap).astype(np.int64)
    return np.cumsum(breaks)


def asof_backward(event_ts: np.ndarray, dim_ts: np.ndarray) -> np.ndarray:
    """Backward as-of match: for each event timestamp, the index of the
    dimension row with the greatest ``dim_ts <= event_ts`` (or -1).

    Zero temporal leakage by construction — the same searchsorted idiom as
    ``get_indices`` (reference:util/windows.py:175-178) pointed backward.
    Both inputs must be sorted ascending.
    """
    pos = np.searchsorted(dim_ts, event_ts, side="right") - 1
    return pos
