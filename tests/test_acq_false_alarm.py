"""False-alarm calibration of the noise-floor-referenced GLRT metric.

The joint multi-component acquisition metric (weighted envelope sums,
GAL_E1C/include/acquisition.m:195, BDS/B1C/include/acquisition.m:213-214)
is normalized by the measured surface floor, so its noise-only
distribution must be (a) weight/component-invariant and (b) below the
preset thresholds — pure-noise trials across single-component,
equal-weight joint, and ICD-weighted joint configurations pin both."""

import numpy as np
import pytest

from cusdr_tpu import get_config
from cusdr_tpu.acquisition import acquire
from cusdr_tpu.signals.defs import get_signal

N_TRIALS = 4


def _noise_metrics(cfg, sig, seed0):
    mets = []
    n = int((cfg.acq_non_coh_time * max(
        1, round(cfg.acq_coh_time / max(sig.code_period_ms, 1e-9)))
        + 46) * cfg.samples_per_code)
    for t in range(N_TRIALS):
        rng = np.random.default_rng(seed0 + t)
        noise = (rng.standard_normal(n)
                 + 1j * rng.standard_normal(n)).astype(np.complex64) * 4.0
        acq = acquire(cfg, sig, noise)
        assert not acq.detected.any(), \
            (cfg.signal, acq.peak_metric[acq.detected])
        mets.append(acq.peak_metric)
    return np.concatenate(mets)


@pytest.fixture(scope="module")
def metrics():
    out = {}
    # single component (L1CA GLRT semantics, acquisition.m:200)
    cfg = get_config("gps_l1ca", sampling_freq=2.048e6, if_freq=7000.0,
                     acq_satellite_list=tuple(range(1, 9)),
                     acq_non_coh_time=4, acq_search_band=2000.0,
                     acq_search_step=500.0)
    out["single"] = _noise_metrics(cfg, get_signal("gps_l1ca"), 100)
    # joint data+pilot, equal weights (E1C acquisition.m:195)
    cfg = get_config("gal_e1c", sampling_freq=4.096e6, if_freq=7000.0,
                     acq_satellite_list=tuple(range(1, 5)),
                     acq_non_coh_time=2, acq_search_band=1000.0,
                     acq_search_step=250.0, fine_n_codes=4)
    out["joint_equal"] = _noise_metrics(cfg, get_signal("gal_e1c"), 200)
    # ICD-weighted joint (B1C sqrt(11)/sqrt(29) split,
    # BDS/B1C/include/acquisition.m:213-214) at the e2e tests' reduced
    # noncoh=2: n_eff = noncoh*(sum w)^2/sum w^2 = 3.3, so the noise
    # max/mean tail reaches ~2.9 — the matched threshold is 3.5
    cfg = get_config("bds_b1c", sampling_freq=4.096e6, if_freq=7000.0,
                     acq_satellite_list=(17, 19, 23),
                     acq_non_coh_time=2, acq_search_band=500.0,
                     acq_search_step=50.0, acq_threshold=3.5)
    out["joint_weighted"] = _noise_metrics(cfg, get_signal("bds_b1c"),
                                           300)
    return out


def test_no_false_alarms(metrics):
    # _noise_metrics already asserts zero detections at preset thresholds
    assert set(metrics) == {"single", "joint_equal", "joint_weighted"}


def _cross_prn_case(signal, fs, prn, cn0, seed, **over):
    """Strong-SV trial: the present PRN must detect; every ABSENT PRN's
    metric must stay under threshold — cross-PRN correlation energy
    raises the measured floor together with any sidelobe peak, so the
    floor-referenced GLRT stays calibrated with a signal present (the
    round-3 false-alarm suite only ever ran pure noise)."""
    from cusdr_tpu.io.synth import SynthSV, synthesize_if
    cfg = get_config(signal, sampling_freq=fs, if_freq=7000.0, **over)
    sig = get_signal(signal)
    rng = np.random.default_rng(seed)
    nav = (1 - 2 * rng.integers(0, 2, 600)).astype(np.int8)
    sv = SynthSV(prn=prn, code_phase=1234.0, doppler_hz=150.0,
                 cn0_dbhz=cn0, nav_bits=nav)
    n_ms = int(cfg.acq_non_coh_time * max(cfg.acq_coh_time,
                                          sig.code_period_ms) + 60)
    samples = synthesize_if(cfg, sig, [sv], num_ms=n_ms, seed=seed)
    acq = acquire(cfg, sig, samples)
    i = list(acq.prns).index(prn)
    assert acq.detected[i], (signal, acq.peak_metric[i])
    false = [(int(p), float(acq.peak_metric[j]))
             for j, p in enumerate(acq.prns)
             if p != prn and acq.detected[j]]
    assert not false, (signal, false)


def test_cross_prn_no_false_alarm_b1c():
    _cross_prn_case("bds_b1c", 4.096e6, 19, 47, 31,
                    acq_satellite_list=(17, 19, 23),
                    acq_non_coh_time=2, acq_search_band=500.0,
                    acq_search_step=50.0, acq_threshold=3.5)


def test_cross_prn_no_false_alarm_e1c():
    _cross_prn_case("gal_e1c", 4.096e6, 11, 51, 32,
                    acq_satellite_list=(9, 11, 14),
                    acq_non_coh_time=4, acq_search_band=1000.0,
                    acq_search_step=250.0, fine_n_codes=4)


def test_metric_scale_weight_invariant(metrics):
    """Floor-referencing makes the noise-only metric distribution agree
    across component counts/weights — the single-component and joint
    medians must sit in the same band (the /weights.sum() heuristic this
    replaces had no such guarantee)."""
    m_single = np.median(metrics["single"])
    m_joint = np.median(metrics["joint_equal"])
    assert 0.7 * m_single < m_joint < 1.4 * m_single, (m_single, m_joint)
    # all sit near the max-of-Rayleigh-mean scale, under their thresholds
    # (the weighted joint case runs at a coarser 50 Hz grid over a 10 ms
    # code: more cells + lower n_eff push its extreme-value level up)
    for k, m in metrics.items():
        hi = 3.2 if k == "joint_weighted" else 2.5
        assert 1.0 < np.median(m) < hi, (k, np.median(m))
        assert m.max() < hi + 0.5, (k, m.max())
