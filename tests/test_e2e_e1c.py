"""Galileo E1 chain test: synthesized E1B/E1C (BOC(1,1), CS25 pilot
secondary, I/NAV pages) through acquisition → tracking → I/NAV decode.

Lighter than the full-PVT golden tests: one SV, 16 s — validates the
Galileo branch of every stage (joint data+pilot acquisition, 4 ms epochs,
pilot-aided tracking, G2-inverted FEC + de-interleave + CRC + ephemeris
fields)."""

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
           CUS=5.115e-06, CRC=255.34, CRS=-115.40, CIC=-9.872e-08,
           CIS=1.3226e-07, SVID=4, t_oc=345600, a_f0=-4.69238e-04,
           a_f1=-3.18323e-12, a_f2=0.0, a_i0=30.0, a_i1=0.1, a_i2=0.001,
           BGD_E1E5a=2e-9, BGD_E1E5b=3e-9, E5b_HS=0, E1b_HS=0, WN=120)


@pytest.fixture(scope="module")
def chain():
    cfg = get_config("gal_e1c", sampling_freq=4.096e6, if_freq=7000.0,
                     acq_satellite_list=(2, 4, 6), acq_search_band=2000.0,
                     acq_search_step=125.0, acq_non_coh_time=2,
                     acq_threshold=2.5)
    sig = get_signal("gal_e1c")
    tow0 = 123456
    # I/NAV page symbols (250 sps = one symbol per 4 ms code period)
    syms = []
    for rep in range(4):
        for i, wt in enumerate([1, 2, 3, 4, 5]):
            w = gal.inav_word(wt, EPH, tow_raw=tow0 + 10 * rep + 2 * i)
            syms.append(gal.inav_encode_page_pair(w))
    nav = (1 - 2 * np.concatenate(syms).astype(np.int8))
    sv = SynthSV(prn=4, code_phase=2233.0, doppler_hz=800.0, cn0_dbhz=48,
                 nav_bits=nav)
    samples = synthesize_if(cfg, sig, [sv], num_ms=16_500, seed=5)
    acq = acquire(cfg, sig, samples)
    iq = quantize_iq_int8(samples)
    i = list(acq.prns).index(4)
    chans = [(4, float(acq.carr_freq[i]), int(acq.code_phase[i]))]
    trk = track(cfg, sig, iq, chans, n_epochs=4000)
    return cfg, sig, sv, acq, trk, tow0


def test_acquisition_joint_components(chain):
    cfg, sig, sv, acq, trk, tow0 = chain
    i = list(acq.prns).index(4)
    assert acq.detected[i]
    err = abs(int(acq.code_phase[i]) - sv.code_phase) % cfg.samples_per_code
    assert min(err, cfg.samples_per_code - err) <= 2
    assert abs(acq.carr_freq[i] - 7800.0) < 20.0
    # other searched PRNs stay quiet
    for j, p in enumerate(acq.prns):
        if p != 4:
            assert not acq.detected[j]


def test_tracking_lock_4ms(chain):
    cfg, sig, sv, acq, trk, tow0 = chain
    ip = np.abs(trk.i_p[0, -1000:]).mean()
    qp = np.abs(trk.q_p[0, -1000:]).mean()
    assert ip > 3 * qp


def test_inav_decode_through_pipeline(chain):
    cfg, sig, sv, acq, trk, tow0 = chain
    eph, start, tow = decode_channel(trk, 0, cfg, sig)
    assert eph is not None
    assert gal.inav_has_ephemeris(eph)
    for k in ("M_0", "e", "sqrtA", "omega_0", "i_0", "omega", "t_oe",
              "a_f0"):
        truth = EPH.get(k, EPH.get("Omega_0") if k == "omega_0" else None)
        if k == "omega_0":
            truth = EPH["Omega_0"]
        assert eph[k] == pytest.approx(truth, rel=1e-6,
                                       abs=abs(truth) * 1e-6 + 1e-9), k
    assert tow % 2 == 0 and abs(tow - tow0) <= 40
