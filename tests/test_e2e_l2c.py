"""GPS L2C chain test: TMRZ CM/CL synthesis through acquisition (20 ms
coherent circshift search + CL-phase resolution), 20 ms-epoch tracking,
and CNAV (Viterbi + CRC-24Q) ephemeris decode.

Covers the reference's GPS_L2C receiver distinctives
(GPS/GPS_L2C/include/acquisition.m:127-167 CL phase search,
tracking.m 20 ms integration, CNAVdecoding.m Viterbi/CRC path).
"""

import numpy as np
import pytest

from cusdr_tpu import get_config
from cusdr_tpu.acquisition import acquire
from cusdr_tpu.io.synth import SynthSV, quantize_iq_int8, synthesize_if
from cusdr_tpu.nav import cnav
from cusdr_tpu.nav.dispatch import decode_channel
from cusdr_tpu.signals.defs import get_signal
from cusdr_tpu.tracking import track

EPH = dict(weekNumber=1214.0, health=0.0, T_op=345600.0, URA_ED=1.0,
           t_oe=345600.0, deltaA=-123.5, ADot=0.001,
           delta_n_0=4.25e-09, delta_n_0Dot=1e-14, M_0=1.19731,
           e=0.0096785, omega=0.97187, omega_0=2.46209, i_0=0.98,
           delta_omegaDot=-1e-9, i_0Dot=-4.9e-10, C_is=1.32e-07,
           C_ic=-9.87e-08, C_rs=-115.4, C_rc=255.34, C_us=5.12e-06,
           C_uc=-6.03e-06, t_oc=345600.0, a_f0=-4.69e-04,
           a_f1=-3.18e-12, a_f2=0.0, T_GD=5.1e-09, ISC_L2C=1e-9)

FS = 2.048e6
IF = 7000.0


def _cfg(**kw):
    # FULL preset band (±10 kHz at 12.5 Hz effective step) — feasible
    # because the circshift search never materializes the 1601-bin mixed
    # tensor (pcps._pcps_circshift_kernel); PLL at the preset 10 Hz x
    # 20 ms via the exact loop design.
    return get_config("gps_l2c", sampling_freq=FS, if_freq=IF,
                      acq_satellite_list=(3, 7, 9),
                      fine_search_step=5.0, acq_threshold=3.0, **kw)


def test_cl_phase_search_resolves_period():
    """One coherent code period pinpoints which of the 75 CM periods
    within the CL cycle the acquisition landed on."""
    cfg = _cfg()
    sig = get_signal("gps_l2c")
    spc = cfg.samples_per_code
    h_true = 37
    sv = SynthSV(prn=7, code_phase=7000.0 - h_true * spc,
                 doppler_hz=90.0, cn0_dbhz=50)
    samples = synthesize_if(cfg, sig, [sv], num_ms=100, seed=3)
    acq = acquire(cfg, sig, samples)
    i = list(acq.prns).index(7)
    assert acq.detected[i]
    err = abs(int(acq.code_phase[i]) - 7000) % spc
    assert min(err, spc - err) <= 2
    assert abs(acq.carr_freq[i] - (IF + 90.0)) < 5.0
    assert int(acq.pilot_phase[i]) == h_true


@pytest.fixture(scope="module")
def chain():
    cfg = _cfg()
    sig = get_signal("gps_l2c")
    tow0 = 345600
    msgs = [cnav.encode_message(mid, EPH, tow0 + 12 * (i + 1), prn=7)
            for i, mid in enumerate([10, 11, 30, 10])]
    nav = cnav.encode_symbol_stream(msgs).astype(np.int8)
    sv = SynthSV(prn=7, code_phase=7000.0, doppler_hz=90.0,
                 cn0_dbhz=48, nav_bits=nav)
    samples = synthesize_if(cfg, sig, [sv], num_ms=38_000, seed=4)
    acq = acquire(cfg, sig, samples)
    iq = quantize_iq_int8(samples)
    i = list(acq.prns).index(7)
    chans = [(7, float(acq.carr_freq[i]), int(acq.code_phase[i]))]
    trk = track(cfg, sig, iq, chans, n_epochs=1860)
    return cfg, sig, sv, acq, trk, tow0, iq


def test_acquisition_20ms_coherent(chain):
    cfg, sig, sv, acq, trk, tow0, iq = chain
    i = list(acq.prns).index(7)
    assert acq.detected[i]
    err = abs(int(acq.code_phase[i]) - 7000) % cfg.samples_per_code
    assert min(err, cfg.samples_per_code - err) <= 2
    assert abs(acq.carr_freq[i] - (IF + 90.0)) < 5.0
    for j, p in enumerate(acq.prns):
        if p != 7:
            assert not acq.detected[j]


def test_tracking_lock_20ms_epochs(chain):
    cfg, sig, sv, acq, trk, tow0, iq = chain
    ip = np.abs(trk.i_p[0, -500:]).mean()
    qp = np.abs(trk.q_p[0, -500:]).mean()
    assert ip > 3 * qp
    # mean code rate matches the Doppler-aided basis (instantaneous
    # code_freq jitters a few Hz at this C/N0 with 20 ms integration)
    basis = sig.chip_rate_hz * (1.0 + 90.0 / sig.carrier_freq_hz)
    assert abs(trk.code_freq[0, -800:].mean() - basis) < 1.0


def test_cnav_decode_through_pipeline(chain):
    cfg, sig, sv, acq, trk, tow0, iq = chain
    eph, start, tow = decode_channel(trk, 0, cfg, sig)
    assert eph is not None
    assert cnav.has_ephemeris(eph)
    for k in ("M_0", "e", "omega", "omega_0", "i_0", "t_oe", "a_f0",
              "deltaA"):
        assert eph[k] == pytest.approx(EPH[k], rel=1e-6,
                                       abs=abs(EPH[k]) * 1e-6 + 1e-12), k
    # ADot sits between 2^-21 grid points — compare on its ICD grid
    assert eph["ADot"] == pytest.approx(
        round(EPH["ADot"] * 2 ** 21) * 2.0 ** -21, abs=1e-12)
    assert tow == tow0


def test_cl_pilot_tracking_improves(chain):
    """CL pilot correlators (pilot_trk_flag=1): the resolved CL phase
    seeds the 75-period pilot counter, the time-multiplexed pilot E/P/L
    run on the data carrier, and averaged data+pilot discriminators cut
    carrier jitter vs CM-only (GPS_L2C/include/tracking.m:160-166,
    317-364; CL counter rollover at 76 -> pilot_period_mod=75)."""
    cfg, sig, sv, acq, trk, tow0, iq = chain
    i = list(acq.prns).index(7)
    chans = [(7, float(acq.carr_freq[i]), int(acq.code_phase[i]),
              int(acq.pilot_phase[i]))]
    trkp = track(cfg.replace(pilot_trk_flag=1), sig, iq, chans,
                 n_epochs=900)
    # the pilot prompt must be coherently locked through the full-period
    # CL table (equal CM/CL power split -> comparable envelopes)
    pe = np.hypot(trkp.pilot_ip[0, 100:], trkp.pilot_qp[0, 100:]).mean()
    de = np.hypot(trkp.i_p[0, 100:], trkp.q_p[0, 100:]).mean()
    assert pe > 0.6 * de, (pe, de)
    # averaged discriminators: lower carrier jitter than CM-only over
    # the same epochs (two equal-power components -> ~1/sqrt(2))
    sl = slice(100, 900)
    assert np.std(trkp.pll_discr[0, sl]) < 0.85 * np.std(trk.pll_discr[0, sl])


def test_cl_pilot_wrong_phase_no_lock(chain):
    """Sanity: a wrong CL period hypothesis decorrelates the pilot."""
    cfg, sig, sv, acq, trk, tow0, iq = chain
    i = list(acq.prns).index(7)
    wrong = (int(acq.pilot_phase[i]) + 30) % 75
    chans = [(7, float(acq.carr_freq[i]), int(acq.code_phase[i]), wrong)]
    trkp = track(cfg.replace(pilot_trk_flag=1), sig, iq, chans,
                 n_epochs=200)
    pe = np.hypot(trkp.pilot_ip[0, 50:], trkp.pilot_qp[0, 50:]).mean()
    de = np.hypot(trkp.i_p[0, 50:], trkp.q_p[0, 50:]).mean()
    assert pe < 0.3 * de, (pe, de)
