"""BeiDou B2a tracked-IF chain: synthesized B2a data/pilot (10.23 Mcps
13-stage LFSR pairs, NH5 data secondary, B-CNAV2 frames) through
acquisition → data+pilot tracking → NH5 despread → Viterbi+CRC B-CNAV2
decode (BDS/B2a/include/BCNAV2decoding.m) — the tracked-IF counterpart
of the synthetic-stream adapter test in test_nav_dispatch."""

import numpy as np
import pytest

from cusdr_tpu import get_config
from cusdr_tpu.io.synth import SynthSV, quantize_iq_int8, synthesize_if
from cusdr_tpu.nav import bcnav
from cusdr_tpu.nav.dispatch import decode_channel
from cusdr_tpu.acquisition import acquire
from cusdr_tpu.signals.defs import get_signal
from cusdr_tpu.tracking import track

EPH = dict(weekNumber=1214.0, health=0.0, T_op=345600.0, URA_ED=1.0,
           t_oe=345600.0, deltaA=-123.5, ADot=0.001,
           delta_n_0=4.25e-09, delta_n_0Dot=1e-14, M_0=1.19731,
           e=0.0096785, omega=0.97187, omega_0=2.46209, i_0=0.98,
           delta_omegaDot=-1e-9, i_0Dot=-4.9e-10, C_is=1.32e-07,
           C_ic=-9.87e-08, C_rs=-115.4, C_rc=255.34, C_us=5.12e-06,
           C_uc=-6.03e-06, t_oc=345600.0, a_f0=-4.69e-04,
           a_f1=-3.18e-12, a_f2=0.0, WN=810, SatType=3,
           T_GDB2ap=1e-9, ISC_B2ad=1e-9)


@pytest.fixture(scope="module")
def chain():
    cfg = get_config("bds_b2a", sampling_freq=12.288e6, if_freq=7000.0,
                     acq_satellite_list=(19, 23), acq_search_band=2000.0,
                     acq_non_coh_time=6, acq_threshold=2.5,
                     pilot_trk_flag=1)
    sig = get_signal("bds_b2a")
    sow0 = 345600
    frames = [bcnav.bcnav2_encode_frame(mid, 19, sow0 + 3 * i, EPH)
              for i, mid in enumerate([10, 11, 30, 34])]
    nav = (1 - 2 * np.concatenate(frames).astype(np.int8))
    sv = SynthSV(prn=19, code_phase=3000.0, doppler_hz=-1500.0,
                 cn0_dbhz=48, nav_bits=nav)
    samples = synthesize_if(cfg, sig, [sv], num_ms=11_000, seed=21)
    acq = acquire(cfg, sig, samples[:int(1.0 * cfg.sampling_freq)])
    iq = quantize_iq_int8(samples)
    del samples
    i = list(acq.prns).index(19)
    chans = [(19, float(acq.carr_freq[i]), int(acq.code_phase[i]))]
    trk = track(cfg, sig, iq, chans, n_epochs=10_500)
    return cfg, sig, sv, acq, trk, sow0


def test_acquisition(chain):
    cfg, sig, sv, acq, trk, sow0 = chain
    i = list(acq.prns).index(19)
    assert acq.detected[i]
    spc = cfg.samples_per_code
    err = abs(int(acq.code_phase[i]) - sv.code_phase) % spc
    assert min(err, spc - err) <= 3
    # the non-target PRN stays quiet
    j = list(acq.prns).index(23)
    assert not acq.detected[j]


def test_tracking_lock(chain):
    cfg, sig, sv, acq, trk, sow0 = chain
    ip = np.abs(trk.i_p[0, -2000:]).mean()
    qp = np.abs(trk.q_p[0, -2000:]).mean()
    assert ip > 3 * qp


def test_bcnav2_decode_through_pipeline(chain):
    cfg, sig, sv, acq, trk, sow0 = chain
    eph, start, sow = decode_channel(trk, 0, cfg, sig)
    assert eph is not None
    assert bcnav.bcnav2_has_ephemeris(eph)
    for k in ("M_0", "e", "i_0", "omega", "t_oe", "a_f0", "deltaA"):
        truth = EPH[k]
        assert eph[k] == pytest.approx(
            truth, rel=1e-6, abs=abs(truth) * 1e-6 + 1e-9), k
    assert sow == sow0
