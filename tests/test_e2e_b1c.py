"""BeiDou B1C chain test: Weil-code BOC(1,1) data + pilot synthesis
through joint acquisition, NB data+pilot tracking (3rd-order PLL,
weighted discriminators), pilot-secondary frame sync and B-CNAV1 decode
(BCH(21,6)/BCH(51,8) ML + de-interleave + CRC-24Q).

Covers the reference's most advanced receiver (BDS/B1C: NB_tracking.m,
BCNAV1decoding.m) end-to-end on one SV, plus unit checks of the B-CNAV
quasi-Keplerian orbit model (BDS/B1C/include/satpos.m)."""

import numpy as np
import pytest

from cusdr_tpu import get_config
from cusdr_tpu.acquisition import acquire
from cusdr_tpu.io.synth import SynthSV, quantize_iq_int8, synthesize_if
from cusdr_tpu.nav import bcnav
from cusdr_tpu.nav.dispatch import decode_channel
from cusdr_tpu.orbits.cnav_kepler import (BDS_A_REF_MEO, GPS_A_REF,
                                          GPS_OMEGA_DOT_REF, sat_pos_cnav)
from cusdr_tpu.orbits.kepler import sat_pos_kepler
from cusdr_tpu.signals.defs import get_signal
from cusdr_tpu.tracking import track

EPH = dict(weekNumber=1214.0, health=0.0, T_op=345600.0, URA_ED=1.0,
           t_oe=345600.0, deltaA=-123.5, ADot=0.0,
           delta_n_0=4.25e-09, delta_n_0Dot=0.0, M_0=1.19731,
           e=0.0096785, omega=0.97187, omega_0=2.46209, i_0=0.98,
           delta_omegaDot=-1e-9, i_0Dot=-4.9e-10, C_is=1.32e-07,
           C_ic=-9.87e-08, C_rs=-115.4, C_rc=255.34, C_us=5.12e-06,
           C_uc=-6.03e-06, t_oc=345600.0, a_f0=-4.69e-04,
           a_f1=-3.18e-12, a_f2=0.0, WN=810, HOW=100, IODC=3, IODE=3,
           SatType=3, T_GDB1Cp=3e-9, ISC_B1Cd=2e-9)

FS = 4.096e6
IF = 7000.0
PRN = 19
SOH = 100          # 18 s frames within the hour


@pytest.fixture(scope="module")
def chain():
    cfg = get_config("bds_b1c", sampling_freq=FS, if_freq=IF,
                     acq_satellite_list=(17, 19, 23),
                     acq_search_band=500.0, acq_search_step=50.0,
                     # threshold matched to the speed-reduced noncoh=2:
                     # the noise-only GLRT peak is the max of ~1.7e6
                     # weighted 2-round envelope sums, E[max/mean] ~ 1 +
                     # cv*sqrt(2 ln N) ~ 2.6 (cv = 0.52/sqrt(n_eff),
                     # n_eff = noncoh*(sum w)^2/sum w^2 = 3.3); 3.5
                     # clears that tail while a 47 dB-Hz SV sits at ~18.
                     # The PRESET keeps the reference's 10.0 at its 10 ms
                     # coherent / noncoh=1 (BDS/B1C/initSettings.m:99).
                     fine_search_step=10.0, acq_threshold=3.5,
                     acq_non_coh_time=2)
    sig = get_signal("bds_b1c")
    frames = [bcnav.bcnav1_encode_frame(PRN, SOH + i, EPH)
              for i in range(2)]
    nav = (1 - 2 * np.concatenate(frames)).astype(np.int8)
    sv = SynthSV(prn=PRN, code_phase=5120.0, doppler_hz=150.0,
                 cn0_dbhz=47, nav_bits=nav)
    samples = synthesize_if(cfg, sig, [sv], num_ms=20_000, seed=9,
                            pilot_power_frac=29.0 / 40.0)
    acq = acquire(cfg, sig, samples)
    iq = quantize_iq_int8(samples)
    i = list(acq.prns).index(PRN)
    chans = [(PRN, float(acq.carr_freq[i]), int(acq.code_phase[i]))]
    trk = track(cfg, sig, iq, chans, n_epochs=1900)
    return cfg, sig, sv, acq, trk


def test_acquisition_weighted_joint(chain):
    cfg, sig, sv, acq, trk = chain
    i = list(acq.prns).index(PRN)
    assert acq.detected[i]
    err = abs(int(acq.code_phase[i]) - 5120) % cfg.samples_per_code
    assert min(err, cfg.samples_per_code - err) <= 2
    assert abs(acq.carr_freq[i] - (IF + 150.0)) < 15.0
    for j, p in enumerate(acq.prns):
        if p != PRN:
            assert not acq.detected[j]


def test_nb_tracking_pilot_lock(chain):
    cfg, sig, sv, acq, trk = chain
    # pilot prompt carries the secondary (sign flips) — power must
    # concentrate in-phase on both components
    pip = np.abs(trk.pilot_ip[0, -500:]).mean()
    pqp = np.abs(trk.pilot_qp[0, -500:]).mean()
    ip = np.abs(trk.i_p[0, -500:]).mean()
    qp = np.abs(trk.q_p[0, -500:]).mean()
    assert pip > 3 * pqp
    assert ip > 3 * qp
    # pilot holds ~29/11 of the data power (BCNAV power split)
    assert 1.1 < pip / ip < 2.6


def test_bcnav1_decode_through_pipeline(chain):
    cfg, sig, sv, acq, trk = chain
    eph, start, tow = decode_channel(trk, 0, cfg, sig)
    assert eph is not None
    assert bcnav.bcnav1_has_ephemeris(eph)
    for k in ("M_0", "e", "omega", "omega_0", "i_0", "t_oe", "a_f0",
              "deltaA"):
        assert eph[k] == pytest.approx(EPH[k], rel=1e-6,
                                       abs=abs(EPH[k]) * 1e-6 + 1e-12), k
    assert eph["PRN"] == PRN
    assert tow == EPH["HOW"] * 3600.0 + SOH * 18.0
    # frame start epoch consistent with the synthesized alignment
    assert start % 1800 == 0


@pytest.fixture(scope="module")
def wb_chain():
    """WB (QMBOC) chain: the BOC(6,1) pilot mainlobes sit at ±6.14 MHz,
    so the wideband mode needs a wide front end (reference FEBW=27 MHz,
    initSettings.m:59) — fs here is 16×1.023 MHz, which also puts the
    0.06-chip correlator spacing on the fast sliced-replica path.  The
    dual pilot bank tracks BOC(1,1) (+Q) and BOC(6,1) (−I) simultaneously
    and combines them into the composite QMBOC pilot with RMS-bandwidth
    DLL weighting (WB_tracking.m:176-188,292-369).
    Channels are truth-initialized (acquisition is covered by the NB
    chain) with a deliberate 5 Hz carrier error to exercise pull-in."""
    fs_wb = 16.368e6
    cfgw = get_config("bds_b1c", sampling_freq=fs_wb, if_freq=IF,
                      pilot_trk_flag=2)
    sig = get_signal("bds_b1c")
    frames = [bcnav.bcnav1_encode_frame(PRN, SOH + i, EPH)
              for i in range(2)]
    nav = (1 - 2 * np.concatenate(frames)).astype(np.int8)
    sv = SynthSV(prn=PRN, code_phase=20480.0, doppler_hz=150.0,
                 cn0_dbhz=47, nav_bits=nav)
    samples = synthesize_if(cfgw, sig, [sv], num_ms=19_500, seed=9)
    iq = quantize_iq_int8(samples)
    del samples
    chans = [(PRN, IF + 155.0, 20480)]
    trkw = track(cfgw, sig, iq, chans, n_epochs=1900)
    return cfgw, sig, trkw


def test_wb_tracking_boc61_pilot_lock(wb_chain):
    """The composite QMBOC pilot must be coherently locked: both pilot
    banks — BOC(1,1) at 29/44 power (+Q) and BOC(6,1) at 4/44 power (−I)
    — rotate onto the in-phase axis and combine per WB_tracking.m:364-369,
    carrying the 1800-chip secondary."""
    cfgw, sig, trkw = wb_chain
    pip = np.abs(trkw.pilot_ip[0, -800:]).mean()
    pqp = np.abs(trkw.pilot_qp[0, -800:]).mean()
    ip = np.abs(trkw.i_p[0, -800:]).mean()
    qp = np.abs(trkw.q_p[0, -800:]).mean()
    assert ip > 3 * qp
    assert pip > 2.5 * pqp
    # composite pilot power 33/44 vs data 11/44 => amplitude ratio sqrt(3)
    assert 1.3 < pip / ip < 2.2, pip / ip


def test_wb_bcnav1_decode_through_pipeline(wb_chain):
    """Full WB chain to B-CNAV1 ephemeris (BCH + de-interleave + CRC)."""
    cfgw, sig, trkw = wb_chain
    eph, start, tow = decode_channel(trkw, 0, cfgw, sig)
    assert eph is not None
    assert bcnav.bcnav1_has_ephemeris(eph)
    for k in ("M_0", "e", "omega", "omega_0", "i_0", "t_oe", "a_f0"):
        assert eph[k] == pytest.approx(EPH[k], rel=1e-6,
                                       abs=abs(EPH[k]) * 1e-6 + 1e-12), k
    assert tow == EPH["HOW"] * 3600.0 + SOH * 18.0


class TestCnavKepler:
    def test_matches_classic_kepler_at_reference_values(self):
        t = 351000.0
        eph_c = dict(EPH)
        eph_c.pop("T_GDB1Cp"), eph_c.pop("ISC_B1Cd")
        pos_c, clk_c = sat_pos_cnav(t, eph_c)
        eph_k = dict(
            t_oc=EPH["t_oc"], t_oe=EPH["t_oe"], a_f0=EPH["a_f0"],
            a_f1=EPH["a_f1"], a_f2=0.0, T_GD=0.0,
            sqrtA=np.sqrt(GPS_A_REF + EPH["deltaA"]),
            deltan=EPH["delta_n_0"], M_0=EPH["M_0"], e=EPH["e"],
            omega=EPH["omega"], omega_0=EPH["omega_0"], i_0=EPH["i_0"],
            iDot=EPH["i_0Dot"],
            omegaDot=GPS_OMEGA_DOT_REF + EPH["delta_omegaDot"],
            C_uc=EPH["C_uc"], C_us=EPH["C_us"], C_rc=EPH["C_rc"],
            C_rs=EPH["C_rs"], C_ic=EPH["C_ic"], C_is=EPH["C_is"])
        pos_k, clk_k = sat_pos_kepler(t, eph_k)
        assert np.linalg.norm(pos_c - pos_k) < 1e-3
        assert clk_c == pytest.approx(clk_k, abs=1e-12)

    def test_bds_meo_radius(self):
        from cusdr_tpu.constants import BDS_GM, BDS_OMEGA_E_DOT
        pos, _ = sat_pos_cnav(351000.0, dict(EPH), a_ref=BDS_A_REF_MEO,
                              gm=BDS_GM, omega_e_dot=BDS_OMEGA_E_DOT,
                              isc_key="ISC_B1Cd")
        r = np.linalg.norm(pos)
        assert 2.75e7 < r < 2.83e7

    def test_adot_moves_radius(self):
        eph2 = dict(EPH, ADot=10.0)    # 10 m/s semi-major growth
        t = EPH["t_oe"] + 1000.0
        p1, _ = sat_pos_cnav(t, dict(EPH))
        p2, _ = sat_pos_cnav(t, eph2)
        dr = np.linalg.norm(p2) - np.linalg.norm(p1)
        assert dr == pytest.approx(10.0 * 1000.0 * (1 - EPH["e"]
                                                    * np.cos(1.2)),
                                   rel=0.2)
