"""All-signal loopback tests: for every registered signal, synthesize IF
with known PRN/code-phase/Doppler, then verify acquisition finds it and
tracking locks.  This exercises the single engine across every numerology
(chip rates 0.511-10.23 Mcps, BOC subcarriers, data+pilot, FDMA, secondary
codes) that the reference implements as 12 separate receivers."""

import numpy as np
import pytest

from cusdr_tpu import get_config
from cusdr_tpu.signals.defs import get_signal
from cusdr_tpu.io.synth import SynthSV, synthesize_if, quantize_iq_int8
from cusdr_tpu.acquisition import acquire
from cusdr_tpu.tracking import track

# (signal, fs, overrides, prns present, prn search list, track_epochs)
CASES = {
    "gps_l1ca": dict(fs=2.048e6, prns=(3, 7), search=range(1, 10),
                     epochs=200),
    # 20 ms coherent PCPS needs fine Doppler bins (reference uses
    # 12.5 Hz circshift search, GPS_L2C/include/acquisition.m:25)
    # runs at the PRESET loop point (PLL 10 Hz x 20 ms, BL*T=0.2):
    # stable via the pole-placement design (loop_design='exact',
    # tracking/loop_filters.py); band reduced for CPU runtime only —
    # the full ±10 kHz preset band is exercised in test_e2e_l2c.py
    "gps_l2c": dict(fs=2.048e6, prns=(3, 8), search=range(1, 9),
                    epochs=25, band=300.0, dopplers=(120.0, -80.0),
                    overrides=dict(acq_threshold=3.0,
                                   acq_search_step=12.5,
                                   fine_search_step=5.0)),
    "gps_l5c": dict(fs=12.288e6, prns=(5, 11), search=range(1, 13),
                    epochs=200, overrides=dict(acq_non_coh_time=6)),
    "gal_e1c": dict(fs=4.096e6, prns=(4, 8), search=range(1, 9),
                    epochs=100,
                    overrides=dict(acq_non_coh_time=2, acq_threshold=2.5)),
    "gal_e5a": dict(fs=12.288e6, prns=(2, 5), search=range(1, 7),
                    epochs=200, overrides=dict(acq_non_coh_time=6,
                                               acq_threshold=3.0)),
    "gal_e5b": dict(fs=12.288e6, prns=(1, 4), search=range(1, 7),
                    epochs=200, overrides=dict(acq_non_coh_time=6,
                                               acq_threshold=3.0,
                                               acq_search_step=250.0)),
    "glo_l1": dict(fs=4.096e6, prns=(-1, 2), search=range(-3, 4),
                   epochs=200, overrides=dict(acq_non_coh_time=8)),
    "glo_l2": dict(fs=4.096e6, prns=(0, 3), search=range(-2, 5),
                   epochs=200, overrides=dict(acq_non_coh_time=8)),
    # 10 ms coherent: 50 Hz bins (preset acqStep, BDS/B1C settings)
    # acq_threshold matched to noncoh=2 (see tests/test_e2e_b1c.py):
    # the noise-only weighted-joint GLRT max sits at ~2.6-2.9 there
    "bds_b1c": dict(fs=4.096e6, prns=(19, 23), search=range(17, 25),
                    epochs=40, band=500.0, dopplers=(120.0, -80.0),
                    overrides=dict(acq_threshold=3.5, acq_non_coh_time=2,
                                   acq_search_step=50.0,
                                   fine_search_step=10.0)),
    "bds_b1i": dict(fs=4.096e6, prns=(6, 12), search=range(6, 14),
                    epochs=200, overrides=dict(acq_non_coh_time=8,
                                               acq_search_step=250.0)),
    "bds_b2a": dict(fs=12.288e6, prns=(19, 25), search=range(19, 27),
                    epochs=200, overrides=dict(acq_non_coh_time=6,
                                               acq_threshold=3.0)),
    "bds_b3i": dict(fs=12.288e6, prns=(1, 7), search=range(1, 9),
                    epochs=200, overrides=dict(acq_non_coh_time=6)),
}

DOPPLERS = (1800.0, -1200.0)
CN0 = 50.0


def _setup(name):
    case = CASES[name]
    over = dict(case.get("overrides", {}))
    over.update(sampling_freq=case["fs"], if_freq=7000.0,
                acq_search_band=case.get("band", 2000.0),
                acq_satellite_list=tuple(case["search"]))
    over.setdefault("acq_search_step", 250.0)
    cfg = get_config(name, **over)
    sig = get_signal(name)
    spc = cfg.samples_per_code
    code_ms = sig.code_period_ms

    dopplers = case.get("dopplers", DOPPLERS)
    svs = []
    for k, prn in enumerate(case["prns"]):
        kw = dict(prn=prn, code_phase=float(977 * (k + 1)),
                  doppler_hz=dopplers[k], cn0_dbhz=CN0)
        if sig.fdma:
            kw["fdma_channel"] = prn
        nav_codes = max(int(round(sig.nav_symbol_ms / code_ms)), 1)
        rng = np.random.default_rng(abs(prn) + 17)
        n_bits = int(2000 / sig.nav_symbol_ms) + 4
        kw["nav_bits"] = rng.choice(np.asarray([-1, 1], np.int8), n_bits)
        svs.append(SynthSV(**kw))

    fine_codes = max(int(round(40.0 / max(code_ms, 1e-9))), 4)
    num_ms = int(np.ceil(
        (cfg.acq_non_coh_time + 2 + fine_codes) * code_ms
        + case["epochs"] * code_ms + 4 * code_ms))
    samples = synthesize_if(cfg, sig, svs, num_ms=num_ms, seed=11)
    return cfg, sig, case, svs, samples


@pytest.fixture(scope="module", params=sorted(CASES), name="scene")
def scene_fixture(request):
    cfg, sig, case, svs, samples = _setup(request.param)
    res = acquire(cfg, sig, samples)
    return request.param, cfg, sig, case, svs, samples, res


def test_acquisition_detects(scene):
    name, cfg, sig, case, svs, samples, res = scene
    present = {sv.prn for sv in svs}
    detected = {int(p) for i, p in enumerate(res.prns) if res.detected[i]}
    assert present <= detected, (name, detected,
                                 dict(zip(res.prns.tolist(),
                                          np.round(res.peak_metric, 2))))


def test_acquisition_no_false_alarms(scene):
    name, cfg, sig, case, svs, samples, res = scene
    present = {sv.prn for sv in svs}
    false = {int(p) for i, p in enumerate(res.prns)
             if res.detected[i]} - present
    assert not false, (name, false)


def test_acquisition_code_phase(scene):
    name, cfg, sig, case, svs, samples, res = scene
    spc = cfg.samples_per_code
    for sv in svs:
        i = list(res.prns).index(sv.prn)
        err = (int(res.code_phase[i]) - sv.code_phase) % spc
        err = min(err, spc - err)
        assert err <= 2.0, (name, sv.prn, res.code_phase[i], sv.code_phase)


def test_fine_frequency(scene):
    name, cfg, sig, case, svs, samples, res = scene
    tol = max(cfg.fine_search_step * 1.5, 40.0)
    for sv in svs:
        i = list(res.prns).index(sv.prn)
        truth = cfg.if_freq + sv.doppler_hz
        if sig.fdma:
            truth += sig.fdma_spacing_hz * sv.fdma_channel
        assert abs(res.carr_freq[i] - truth) <= tol, \
            (name, sv.prn, res.carr_freq[i], truth)


def test_tracking_locks(scene):
    name, cfg, sig, case, svs, samples, res = scene
    iq = quantize_iq_int8(samples)
    channels = []
    for sv in svs:
        i = list(res.prns).index(sv.prn)
        channels.append((sv.prn, float(res.carr_freq[i]),
                         int(res.code_phase[i])))
    tr = track(cfg, sig, iq, channels, n_epochs=case["epochs"])
    tail = case["epochs"] // 2
    for c, sv in enumerate(svs):
        ip = np.abs(tr.i_p[c, -tail:]).mean()
        qp = np.abs(tr.q_p[c, -tail:]).mean()
        assert ip > 2.5 * qp, (name, c, ip, qp)
        truth = cfg.if_freq + sv.doppler_hz
        if sig.fdma:
            truth += sig.fdma_spacing_hz * sv.fdma_channel
        got = tr.carr_freq[c, -tail:].mean()
        assert abs(got - truth) < 20.0, (name, c, got, truth)
        code_truth = sig.chip_rate_hz * (
            1 + sv.doppler_hz / sig.carrier_freq_hz)
        code_got = tr.code_freq[c, -tail:].mean()
        assert abs(code_got - code_truth) < 2.0 * sig.chip_rate_hz / 1e6, \
            (name, c, code_got, code_truth)


def test_b1c_wideband_qmboc_tracking():
    """WB (pilotTRKflag=2) mode: dual BOC(1,1)+BOC(6,1) pilot bank with
    the reference's composite combine -sqrt(4/33)*p61 - j*sqrt(29/33)*p11
    and QMBOC DLL weighting (WB_tracking.m:292-369, CalcWeighingFactor.m)
    locks carrier and code on a full-QMBOC synthesized signal."""
    from cusdr_tpu.tracking.qmboc import calc_weighing_factor

    factor = calc_weighing_factor(1.023e6, 27e6)
    assert 0.05 < factor < 0.5    # data weight minority (BOC61 sharper)

    sig = get_signal("bds_b1c")
    cfg = get_config("bds_b1c", sampling_freq=16.384e6, if_freq=7000.0,
                     pilot_trk_flag=2)
    rng = np.random.default_rng(1)
    sv = SynthSV(prn=19, code_phase=977.0, doppler_hz=300.0, cn0_dbhz=50,
                 nav_bits=rng.choice(np.asarray([-1, 1], np.int8), 100))
    iq = quantize_iq_int8(synthesize_if(cfg, sig, [sv], num_ms=450,
                                        seed=4))
    res = track(cfg, sig, iq, [(19, 7300.0, 977)], n_epochs=40)
    ip = np.abs(res.i_p[0, -15:]).mean()
    qp = np.abs(res.q_p[0, -15:]).mean()
    assert ip > 3 * qp
    # composite pilot carries 33/44 of total power vs the data's 11/44,
    # so |pilot prompt| / |data prompt| ~ sqrt(3)
    pip = np.abs(res.pilot_ip[0, -15:]).mean()
    pqp = np.abs(res.pilot_qp[0, -15:]).mean()
    assert pip > 3 * pqp
    assert 1.3 < pip / ip < 2.2
    assert abs(res.carr_freq[0, -10:].mean() - 7300.0) < 10.0
