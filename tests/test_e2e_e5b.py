"""Galileo E5b tracked-IF chain: synthesized E5b-I/Q (10.23 Mcps LFSR
pairs, CS4 data / CS100-class pilot secondaries, I/NAV pages at 250 sps)
through acquisition (60 Hz preset grid class), pilot-aided 3rd-order-PLL
tracking and CS4-despread I/NAV decode
(GAL/GAL_E5b/include/NAVdecoding.m:80-89 — the 4-chip data secondary —
and the shared I/NAV word parser).  Words 1-5 (10 s) are required for an
ephemeris, so this runs ~13 s of wideband signal.

Completes the tracked-IF chain coverage: with this file every signal the
reference ships a receiver for decodes ephemeris from IF samples.
"""

import numpy as np
import pytest

from cusdr_tpu import get_config
from cusdr_tpu.io.synth import SynthSV, quantize_iq_int8, synthesize_if
from cusdr_tpu.nav import galileo_nav as gal
from cusdr_tpu.nav.dispatch import decode_channel
from cusdr_tpu.acquisition import acquire
from cusdr_tpu.signals.defs import get_signal
from cusdr_tpu.tracking import track

EPH = dict(IODnav1=57, IODnav2=57, IODnav3=57, IODnav4=57,
           t_oe=345600, M_0=1.19731, e=0.0096785, sqrtA=5440.602,
           Omega_0=2.46209, i_0=0.98, omega=0.97187, iDot=-4.893e-10,
           OmegaDot=-8.083e-09, deltan=4.2487e-09, CUC=-6.033e-06,
           CUS=5.115e-06, CRC=255.34, CRS=-115.40, CIC=-9.87e-08,
           CIS=1.32e-07, SVID=4, t_oc=345600, a_f0=-4.69238e-04,
           a_f1=-3.18323e-12, a_f2=0.0, a_i0=30.0, a_i1=0.1, a_i2=0.001,
           BGD_E1E5a=2e-9, BGD_E1E5b=3e-9, E5b_HS=0, E1b_HS=0, WN=120)


@pytest.fixture(scope="module")
def chain():
    cfg = get_config("gal_e5b", sampling_freq=12.288e6, if_freq=7000.0,
                     acq_satellite_list=(2, 4), acq_search_band=2000.0,
                     acq_search_step=250.0, acq_non_coh_time=6,
                     acq_threshold=2.5)
    sig = get_signal("gal_e5b")
    tow0 = 123456
    # I/NAV word every 2 s (even/odd page pair); 1..5 carry the
    # ephemeris, repeat word 1 for margin
    syms = [gal.inav_encode_page_pair(
        gal.inav_word(wt, EPH, tow_raw=tow0 + 2 * i))
        for i, wt in enumerate([1, 2, 3, 4, 5, 1, 2])]
    nav = (1 - 2 * np.concatenate(syms)).astype(np.int8)
    sv = SynthSV(prn=4, code_phase=5233.0, doppler_hz=-900.0,
                 cn0_dbhz=48, nav_bits=nav)
    samples = synthesize_if(cfg, sig, [sv], num_ms=13_500, seed=21)
    acq = acquire(cfg, sig, samples[:int(2.0 * cfg.sampling_freq)])
    iq = quantize_iq_int8(samples)
    del samples
    i = list(acq.prns).index(4)
    chans = [(4, float(acq.carr_freq[i]), int(acq.code_phase[i]))]
    trk = track(cfg, sig, iq, chans, n_epochs=13_000)
    return cfg, sig, sv, acq, trk, tow0


def test_acquisition(chain):
    cfg, sig, sv, acq, trk, tow0 = chain
    i = list(acq.prns).index(4)
    assert acq.detected[i]
    spc = cfg.samples_per_code
    err = abs(int(acq.code_phase[i]) - sv.code_phase) % spc
    assert min(err, spc - err) <= 3
    assert abs(acq.carr_freq[i] - (7000.0 - 900.0)) < 15.0


def test_tracking_lock_pilot(chain):
    cfg, sig, sv, acq, trk, tow0 = chain
    ip = np.abs(trk.i_p[0, -3000:]).mean()
    qp = np.abs(trk.q_p[0, -3000:]).mean()
    assert ip > 3 * qp


def test_inav_decode_through_pipeline(chain):
    """Tracked-IF I/NAV via the CS4 data secondary: words 1-5 decoded
    off the air match the broadcast ephemeris."""
    cfg, sig, sv, acq, trk, tow0 = chain
    eph, start, tow = decode_channel(trk, 0, cfg, sig)
    assert eph is not None
    assert gal.inav_has_ephemeris(eph)
    for k in ("M_0", "e", "i_0", "omega", "t_oe", "a_f0", "sqrtA"):
        truth = EPH[k]
        assert eph[k] == pytest.approx(
            truth, rel=1e-6, abs=abs(truth) * 1e-6 + 1e-9), k
    assert eph["omega_0"] == pytest.approx(EPH["Omega_0"], rel=1e-6)
    assert tow == tow0
