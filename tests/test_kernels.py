"""Kernel unit tests: F2/F6 fixtures of FIXTURES.md, reference semantics."""

import numpy as np
import pytest

from pymhealth_ray.functions import (
    filters,
    frequency,
    heart,
    hrv,
    information,
    location,
    rqa,
    stats,
    timedom,
    windows,
)

SINE = np.sin(2 * np.pi * np.arange(256) / 32)
RNG = np.random.default_rng(7)
RANDN = RNG.normal(size=500)


class TestStats:
    def test_const_guards(self):
        const = np.full(64, 7.0)
        assert stats.skewness(const) == 0.0
        assert stats.kurtosis(const) == 0.0
        assert stats.std(const) == 0.0

    def test_mode_tie_smallest(self):
        assert stats.mode(np.array([3, 1, 1, 3, 2])) == 1.0

    def test_population_moments(self):
        assert np.isclose(stats.var(RANDN), np.var(RANDN, ddof=0))
        assert np.isclose(
            stats.interquartile_range(RANDN),
            np.percentile(RANDN, 75) - np.percentile(RANDN, 25),
        )

    def test_derived(self):
        assert np.isclose(stats.drange(RANDN), RANDN.max() - RANDN.min())
        assert np.isclose(stats.coeff_var(RANDN + 10), np.std(RANDN + 10) / np.mean(RANDN + 10))
        assert np.isclose(stats.kurtosis_excess(RANDN), stats.kurtosis(RANDN) - 3)


class TestTimedom:
    def test_zero_crossing_sine(self):
        assert timedom.zero_crossing_count(SINE) == 16.0

    def test_plateau_double_crossing(self):
        # +,0,+ yields TWO crossings (reference:generic/timedom.py:46-49)
        assert timedom.zero_crossings(np.array([1.0, 0.0, 1.0])).tolist() == [True, True]

    def test_threshold_clamp(self):
        x = np.array([0.5, -0.5, 0.5])
        assert timedom.zero_crossing_count(x) == 2.0
        assert timedom.zero_crossing_count(x, th=0.6) == 0.0  # all clamped to 0

    def test_gradient_matches_np(self):
        assert np.allclose(timedom.gradient(RANDN), np.gradient(RANDN))

    def test_o1fit_exact_on_ramp(self):
        ic, sl = timedom.o1fit(np.arange(100.0), 2 * np.arange(100.0) + 5)
        assert np.isclose(ic, 5) and np.isclose(sl, 2)

    def test_line_length(self):
        assert timedom.line_length(np.full(10, 3.0)) == 0.0
        assert np.isclose(timedom.line_length(SINE), np.abs(np.diff(SINE)).sum())

    def test_hjorth_relations(self):
        act = timedom.hjorth_activity(RANDN)
        mob = timedom.hjorth_mobility(RANDN)
        assert np.isclose(act, np.var(RANDN))
        assert np.isclose(mob, np.sqrt(np.var(np.gradient(RANDN)) / np.var(RANDN)))
        a2, m2, c2 = timedom.hjorth_parameters(RANDN)
        assert np.isclose(a2, act) and np.isclose(m2, mob)
        assert np.isclose(c2, timedom.hjorth_complexity(RANDN))

    def test_hurst_random_walk(self):
        walk = np.cumsum(RNG.normal(size=5000))
        h = timedom.hurst(walk)
        assert 0.3 < h < 0.7


class TestWindows:
    def test_view_and_rolling(self):
        out = windows.rolling_apply(np.mean, 10, 5)(np.arange(23.0))
        assert np.allclose(out, [4.5, 9.5, 14.5])
        assert windows.view(np.arange(10), 4, 2).shape == (4, 4)

    def test_get_indices_grid_anchoring(self):
        ts = np.arange(100) * 10**9
        idx = windows.get_indices(ts, 10 * 10**9, 10 * 10**9)
        assert idx.shape == (2, 10)
        agg = windows.nonuniform_rolling_apply(np.mean)(ts, np.arange(100.0), 10 * 10**9, 10 * 10**9)
        assert np.allclose(agg, np.arange(10) * 10 + 4.5)

    def test_min_window_nan(self):
        # gappy fixture: window covering no events → NaN
        ts = np.array([0, 1, 2, 200, 201]) * 10**9
        agg = windows.nonuniform_rolling_apply(np.mean, min_window_len=1)(
            ts, np.arange(5.0), 10 * 10**9, 10 * 10**9
        )
        assert np.isclose(agg[0], 1.0)
        assert np.isnan(agg[1])

    def test_single_event_no_windows(self):
        ts = np.array([5 * 10**9])
        idx = windows.get_indices(ts, 10**9, 10**9)
        assert idx.shape[1] == 0

    def test_dict_variant_named(self):
        ts = np.arange(20) * 10**9
        out = windows.nonuniform_rolling_apply({"m": np.mean, "s": np.std})(
            ts, np.arange(20.0), 5 * 10**9, 5 * 10**9
        )
        assert set(out) == {"m", "s"}
        assert np.allclose(out["m"], [2, 7, 12, 17])


class TestHRV:
    NNI_MS = np.array([800.0, 810, 790, 805, 795, 900, 700, 800])

    def test_lag_features(self):
        d = np.diff(self.NNI_MS)
        assert np.isclose(hrv.rmssd(self.NNI_MS), np.sqrt(np.mean(d**2)))
        assert np.isclose(hrv.sdsd(self.NNI_MS), np.std(d))
        assert np.isclose(hrv.ssd(self.NNI_MS), d.sum())
        assert np.isclose(hrv.pnn50(self.NNI_MS), (np.abs(d) > 50).mean())

    def test_unit_conversion(self):
        assert hrv.td_factor("s") == 1e9
        assert np.allclose(hrv.nni_to_ms(np.array([1.0]), "s"), [1000.0])
        with pytest.raises(ValueError):
            hrv.td_factor("min")

    def test_two_level_aggregates(self):
        # two-level fixture: 30 min of 1s intervals with step change at 15 min
        nni = np.concatenate([np.full(900, 1.0), np.full(900, 2.0)])
        sd = hrv.sdann(nni, unit="s", interval=300)
        # window means: five ~1.0 then ~2.0 → std > 0
        assert sd > 0.3
        assert hrv.sdnni(np.ones(1800), unit="s") == 0.0

    def test_poincare(self):
        rri = self.NNI_MS
        sd1, sd2 = hrv.csi_sd1(rri), hrv.csi_sd2(rri)
        assert np.isclose(hrv.lorenz_csi(rri), sd1 / sd2)
        assert np.isclose(hrv.lorenz_cvi(rri), np.log10(sd1 * sd2))
        assert np.isclose(hrv.lorenz_mcsi(rri), sd1**2 / sd2)


class TestLocation:
    # F6 golden values: reference tests assume 2r=12742.0 while reference
    # CODE uses 12742.018 (recorded divergence); engine follows the code.
    def test_haversine_code_constant(self):
        d = location.haversine(0.1532, 86.675, 33.123, 21.541)
        assert np.isclose(d * 12742.0 / 12742.018, 7704.777296228049, rtol=1e-9)

    def test_vector_and_outer(self):
        lats = np.array([0.1532, 33.123, 41.507483])
        lons = np.array([86.675, 21.541, -99.436554])
        v = location.haversine_vector(lats[0], lons[0], lats, lons)
        assert v[0] == 0.0
        m = location.haversine_outer_product(lats, lons, lats, lons)
        assert np.allclose(np.diag(m), 0) and np.allclose(m, m.T)

    def test_successive_distance_head_zero(self):
        lats = np.array([0.0, 1.0, 2.0])
        lons = np.zeros(3)
        d = location.arr_successive_distance(lats, lons)
        assert d[0] == 0.0 and d[1] > 100

    def test_entropy_cluster(self):
        labels = np.array([0, 0, 1, 1])
        assert np.isclose(location.cluster_entropy(labels), np.log(2), atol=1e-6)
        assert np.isclose(location.normalized_cluster_entropy(labels), 1.0, atol=1e-6)

    def test_home_coords_night_filter(self):
        ns_h = 3_600_000_000_000
        ts = np.array([0 * ns_h, 12 * ns_h, 23 * ns_h + 1])  # 00:00 (night), 12:00, 23:00
        lat = np.array([1.0, 50.0, 3.0])
        lon = np.array([2.0, 60.0, 4.0])
        hlat, hlon = location.determine_home_coords(ts, lat, lon)
        assert hlat == 2.0 and hlon == 3.0  # median of night rows only


class TestInformation:
    def test_entropy_uniform(self):
        assert np.isclose(information.entropy(np.array([1, 1, 1, 1])), np.log(4), atol=1e-6)

    def test_sampen_order(self):
        reg = np.sin(np.arange(200) / 3.0)
        noi = RNG.normal(size=200)
        assert information.sampen(reg) < information.sampen(noi)


class TestRQA:
    def test_recurrence_identity(self):
        r = rqa.rq(np.array([1.0, 2.0, 1.0]), radius=0)
        assert r[0, 2] and r[2, 0] and not r[0, 1]
        assert np.isclose(rqa.recurrence_rate(r), 5 / 9)

    def test_diagonal_lengths(self):
        r = np.eye(5, dtype=bool)
        lens = rqa.diagonal_lengths(r, 2)
        assert lens.tolist() == [5]
        assert rqa.vertical_lengths(r, 2).size == 0


class TestFilters:
    def test_lowpass_dc_unity(self):
        f = filters.butterworth(np.full(200, 3.0), 0.1, 100.0, order=5, ftype="lowpass")
        assert np.abs(f - 3.0).max() < 1e-9

    def test_bandpass_selectivity(self):
        t = np.arange(2000) / 250.0
        comp = np.sin(2 * np.pi * 1 * t) + np.sin(2 * np.pi * 10 * t) + np.sin(2 * np.pi * 60 * t)
        bp = heart.bandpass(comp, 250.0, 5, 15, order=3)
        spec_in = np.abs(np.fft.rfft(comp))
        spec_out = np.abs(np.fft.rfft(bp))
        g = lambda fq: spec_out[int(len(t) * fq / 250)] / spec_in[int(len(t) * fq / 250)]
        assert g(10) > 0.95 and g(1) < 0.05 and g(60) < 0.01

    def test_slope_sum_matches_loop(self):
        x = RNG.normal(size=300)
        w = 37
        exp = np.zeros(300)
        dx = np.diff(x)
        for i in range(w, 299):
            exp[i] = dx[i - w : i].sum()
        assert np.allclose(filters.slope_sum(x, w), exp)

    def test_pt_differentiate_quirk(self):
        # reference kernel slices to [1] → behavior is x/8 (recorded quirk)
        x = RNG.normal(size=50)
        assert np.allclose(filters.pt_differentiate(x), x / 8)


class TestHeart:
    def test_qrs_impulse_train(self):
        ecg = np.zeros(5000)
        ecg[::250] = 1.0
        ecg = filters.moving_average(ecg, 5)
        peaks = heart.rpeaks_hamilton_tompkins(ecg, 250.0)
        assert len(peaks) == 20
        assert np.abs(np.diff(peaks)[1:] - 250).max() <= 2

    def test_find_peaks_strict(self):
        assert heart.find_peaks(np.array([0, 1, 0, 2, 2, 0])).tolist() == [1]

    def test_beat_correlation_identical_beats(self):
        sr = 100
        x = np.tile(np.sin(2 * np.pi * np.arange(sr) / sr), 40)
        peaks = np.arange(5, 40) * sr + sr // 4
        q = heart.beat_correlation(x, peaks, sr)
        assert np.nanmean(q[25:-1]) > 0.99


class TestFrequency:
    def test_peak_frequency_banded(self):
        psd = np.array([10.0, 1, 2, 9, 3])
        freqs = np.array([0.0, 1, 2, 3, 4])
        # corrected band-relative indexing (density.py variant)
        assert frequency.peak_frequency(psd, freqs, 1.0, 4.0) == 3.0
        assert np.isclose(hrv.power_band(psd, freqs, 1, 3), 12.0)

    def test_nufft_matches_direct(self):
        xs = np.sort(RNG.uniform(0, 2 * np.pi, 80))
        c = np.sin(3 * xs) + 0.5 * np.cos(7 * xs)
        M = 32
        direct = (1 / len(xs)) * np.array(
            [np.sum(c * np.exp(1j * k * xs)) for k in frequency.nufftfreqs(M)]
        )
        approx = frequency.nufft1d1(xs, c, M)
        assert np.abs(direct - approx).max() < 1e-10


class TestBuildGridFast:
    def test_fast_matches_slow_and_nudft(self):
        from pymhealth_ray.functions import frequency as F

        rng = np.random.default_rng(17)
        x = rng.uniform(0, 2 * np.pi, 200)
        c = rng.normal(size=200) + 1j * rng.normal(size=200)
        mr, msp, lam = F._compute_grid_params(64, 1e-12)
        tau = np.pi * lam / 64**2
        fast = F.build_grid_fast(x, c, mr, msp, tau)
        slow = F._build_grid_slow(x, c, mr, msp, tau)
        assert np.allclose(fast, slow, atol=1e-12)
        # end-to-end: nufft (now on the fast grid) still matches the direct
        # non-uniform DFT at the requested accuracy
        got = F.nufft1d1(x, c, 64, eps=1e-12)
        k = F.nufftfreqs(64)
        direct = (1 / len(x)) * np.array(
            [np.sum(c * np.exp(1j * kk * x)) for kk in k]
        )
        assert np.allclose(got, direct, atol=1e-9)
