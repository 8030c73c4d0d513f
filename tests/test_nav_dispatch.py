"""Per-signal nav-decode dispatch tests: synthetic prompt-correlator
streams (noise + arbitrary secondary-code phase + polarity) through
``nav.dispatch.decode_channel`` for every adapter that has no full-IF
chain test: GPS L5 (NH10+CNAV), Galileo E5a (CS20+F/NAV), Galileo E5b
(CS4+I/NAV), BeiDou B2a (NH5+B-CNAV2), BeiDou B1C (pilot-secondary frame
sync + B-CNAV1), BeiDou GEO D2 (2 ms bits, BCH15, split fields).

The reference equivalent of this layer is each receiver's NAVdecoding.m /
BCNAVxdecoding.m symbol-conditioning preamble (GPS_L5C NAVdecoding.m,
GAL_E5a NAVdecoding.m:95-130, BDS/B2a BCNAV2decoding.m:69-78,
BDS/B1C BCNAV1decoding.m:65-90, BDS/B1I NAVdecoding.m PRN<=5 branch).
"""

import numpy as np
import pytest

from cusdr_tpu import get_config
from cusdr_tpu.nav import bcnav, bds_d1, cnav
from cusdr_tpu.nav import galileo_nav as gal
from cusdr_tpu.nav.dispatch import decode_channel
from cusdr_tpu.signals import codes as C
from cusdr_tpu.signals.defs import get_signal

AMP = 1000.0
SIGMA = 150.0

EPH = dict(weekNumber=1214.0, health=0.0, T_op=345600.0, URA_ED=1.0,
           t_oe=345600.0, deltaA=-123.5, ADot=0.001,
           delta_n_0=4.25e-09, delta_n_0Dot=1e-14, M_0=1.19731,
           e=0.0096785, omega=0.97187, omega_0=2.46209, i_0=0.98,
           delta_omegaDot=-1e-9, i_0Dot=-4.9e-10, C_is=1.32e-07,
           C_ic=-9.87e-08, C_rs=-115.4, C_rc=255.34, C_us=5.12e-06,
           C_uc=-6.03e-06, t_oc=345600.0, a_f0=-4.69e-04,
           a_f1=-3.18e-12, a_f2=0.0, T_GD=5.1e-09, ISC_L2C=1e-9)


class FakeTrack:
    """Minimal stand-in for tracking.TrackResults (the decode adapters
    only read i_p / pilot_ip / prns)."""

    def __init__(self, i_p, pilot_ip=None, prn=1):
        self.i_p = np.asarray(i_p, np.float64)[None, :]
        if pilot_ip is not None:
            self.pilot_ip = np.asarray(pilot_ip, np.float64)[None, :]
        self.prns = [prn]


def _noisy(x, seed):
    rng = np.random.default_rng(seed)
    return AMP * np.asarray(x, np.float64) + SIGMA * rng.standard_normal(
        len(x))


def _epochs(symbols_pm, epochs_per_symbol, secondary, lead_symbols,
            drop, seed, polarity=1):
    """Expand ±1 nav symbols to per-epoch prompts: prepend ``lead_symbols``
    random symbols, modulate the per-symbol secondary, then drop ``drop``
    leading epochs so the secondary phase seen by the decoder is
    arbitrary."""
    rng = np.random.default_rng(seed + 1)
    lead = 1 - 2 * rng.integers(0, 2, lead_symbols).astype(np.float64)
    sym = np.concatenate([lead, np.asarray(symbols_pm, np.float64)])
    sec = (np.ones(epochs_per_symbol) if secondary is None
           else np.asarray(secondary, np.float64))
    epochs = polarity * np.kron(sym, sec)
    return _noisy(epochs[drop:], seed)


def _check(eph, keys=("M_0", "e", "omega", "i_0", "t_oe", "a_f0")):
    for k in keys:
        assert eph[k] == pytest.approx(EPH[k], rel=1e-6,
                                       abs=abs(EPH[k]) * 1e-6 + 1e-12), k


def test_l5_cnav_nh10():
    sig = get_signal("gps_l5c")
    cfg = get_config("gps_l5c")
    tow0 = 345600
    msgs = [cnav.encode_message(mid, EPH, tow0 + 6 * (i + 1), prn=7)
            for i, mid in enumerate([10, 11, 30])]
    sym = cnav.encode_symbol_stream(msgs)
    i_p = _epochs(sym, 10, C.NH10, lead_symbols=23, drop=7, seed=11)
    eph, start, tow = decode_channel(FakeTrack(i_p, prn=7), 0, cfg, sig)
    assert eph is not None and cnav.has_ephemeris(eph)
    _check(eph)
    assert tow == tow0
    # first message starts 23 symbols in, minus the 7 dropped epochs
    assert start == 23 * 10 - 7


def test_e5a_fnav_cs20():
    sig = get_signal("gal_e5a")
    cfg = get_config("gal_e5a")
    geph = dict(EPH, IODnav1=57, IODnav2=57, IODnav3=57, IODnav4=57,
                sqrtA=5440.6, OmegaDot=-8.08e-09, Omega_0=2.46209,
                deltan=4.25e-09, CUC=-6.03e-06, CUS=5.12e-06, CRC=255.34,
                CRS=-115.4, CIC=-9.87e-08, CIS=1.32e-07, SVID=4,
                iDot=-4.9e-10, t_oe=345600, t_oc=345600, a_i0=30.0,
                a_i1=0.1, a_i2=0.001, BGD_E1E5a=2e-9, E5a_HS=0, WN=120)
    tow0 = 123450
    pages = [gal.fnav_encode_page(pt, geph, tow_raw=tow0 + 10 * i)
             for i, pt in enumerate([1, 2, 3, 4])]
    sym = 1 - 2 * np.concatenate(pages).astype(np.float64)
    i_p = _epochs(sym, 20, C.E5AI_SECONDARY, lead_symbols=9, drop=13,
                  seed=12, polarity=-1)
    eph, start, tow = decode_channel(FakeTrack(i_p, prn=4), 0, cfg, sig)
    assert eph is not None and gal.fnav_has_ephemeris(eph)
    _check(eph, keys=("M_0", "e", "i_0", "omega", "t_oe", "a_f0"))
    assert eph["omega_0"] == pytest.approx(geph["Omega_0"], rel=1e-6)
    assert tow == tow0
    assert start == 9 * 20 - 13


def test_e5b_inav_cs4():
    sig = get_signal("gal_e5b")
    cfg = get_config("gal_e5b")
    geph = dict(EPH, IODnav1=57, IODnav2=57, IODnav3=57, IODnav4=57,
                sqrtA=5440.6, OmegaDot=-8.08e-09, Omega_0=2.46209,
                deltan=4.25e-09, CUC=-6.03e-06, CUS=5.12e-06, CRC=255.34,
                CRS=-115.4, CIC=-9.87e-08, CIS=1.32e-07, SVID=4,
                iDot=-4.9e-10, t_oe=345600, t_oc=345600, a_i0=30.0,
                a_i1=0.1, a_i2=0.001, BGD_E1E5a=2e-9, BGD_E1E5b=3e-9,
                E5b_HS=0, E1b_HS=0, WN=120)
    tow0 = 123456
    syms = [gal.inav_encode_page_pair(
        gal.inav_word(wt, geph, tow_raw=tow0 + 2 * i))
        for i, wt in enumerate([1, 2, 3, 4, 5])]
    sym = 1 - 2 * np.concatenate(syms).astype(np.float64)
    i_p = _epochs(sym, 4, C.E5BI_SECONDARY, lead_symbols=31, drop=2,
                  seed=13)
    eph, start, tow = decode_channel(FakeTrack(i_p, prn=4), 0, cfg, sig)
    assert eph is not None and gal.inav_has_ephemeris(eph)
    _check(eph, keys=("M_0", "e", "i_0", "omega", "t_oe", "a_f0"))
    assert tow == tow0
    assert start == 31 * 4 - 2


def test_b2a_bcnav2_nh5():
    sig = get_signal("bds_b2a")
    cfg = get_config("bds_b2a")
    beph = dict(EPH, WN=810, SatType=3, T_GDB2ap=1e-9, ISC_B2ad=1e-9)
    sow0 = 345600
    frames = [bcnav.bcnav2_encode_frame(mid, 19, sow0 + 3 * i, beph)
              for i, mid in enumerate([10, 11, 30])]
    sym = 1 - 2 * np.concatenate(frames).astype(np.float64)
    i_p = _epochs(sym, 5, C.NH5, lead_symbols=17, drop=3, seed=14,
                  polarity=-1)
    eph, start, tow = decode_channel(FakeTrack(i_p, prn=19), 0, cfg, sig)
    assert eph is not None and bcnav.bcnav2_has_ephemeris(eph)
    _check(eph)
    assert tow == sow0
    assert start == 17 * 5 - 3


def test_b1c_bcnav1_secondary_framesync():
    sig = get_signal("bds_b1c")
    cfg = get_config("bds_b1c")
    prn = 19
    beph = dict(EPH, WN=810, HOW=100, IODC=0, IODE=0, SatType=3,
                ISC_B1Cd=2e-9, T_GDB1Cp=3e-9)
    frame = 1 - 2 * bcnav.bcnav1_encode_frame(prn, 100, beph).astype(
        np.float64)
    sec = C.b1c_secondary(prn).astype(np.float64)
    off, pad = 137, 260
    n = off + 1800 + pad
    k = np.arange(n)
    rng = np.random.default_rng(15)
    pilot = _noisy(sec[(k - off) % 1800], 16)
    data = np.where(k < off,
                    1 - 2.0 * rng.integers(0, 2, n),
                    frame[np.minimum((k - off) % 1800,
                                     1799)])
    i_p = _noisy(data, 17)
    eph, start, tow = decode_channel(FakeTrack(i_p, pilot_ip=pilot,
                                               prn=prn), 0, cfg, sig)
    assert eph is not None and bcnav.bcnav1_has_ephemeris(eph)
    _check(eph)
    assert start == off
    # SOH=100 counts 18 s frames; HOW=100 hours
    assert tow == beph["HOW"] * 3600.0 + 1800.0


def test_bds_d2_geo():
    sig = get_signal("bds_b1i")
    cfg = get_config("bds_b1i")
    deph = dict(SatH1=0, IODC=12, URAI=0, WN=810,
                t_oc=345600.0, T_GD_1=1.2e-9, IODE=12,
                deltan=4.25e-09, C_us=5.12e-06, C_rc=255.34375,
                C_rs=-115.40625, C_is=1.32e-07, t_oe=345600.0,
                alpha0=1e-8, alpha1=-2e-8, alpha2=3e-7, alpha3=-1e-7,
                beta0=128000.0, beta1=-32768.0, beta2=131072.0,
                beta3=-65536.0)
    # split fields on their ICD grids
    def split(raw, nm, nl, name_m, name_l):
        if raw < 0:
            raw += 1 << (nm + nl)
        deph[name_m] = raw >> nl
        deph[name_l] = raw & ((1 << nl) - 1)
    split(int(round(-4.69e-04 * 2 ** 33)), 4 + 12, 0, "a0", "a0")
    deph["a0"] = round(-4.69e-04 * 2 ** 33) * 2.0 ** -33
    split(int(round(-3.2e-12 * 2 ** 50)), 4, 18, "a1_msb", "a1_lsb")
    split(int(round(-6.03e-06 * 2 ** 31)), 14, 4, "C_uc_msb", "C_uc_lsb")
    split(int(round(0.0096785 * 2 ** 33)), 10, 22, "e_msb", "e_lsb")
    split(int(round(-9.87e-08 * 2 ** 31)), 10, 8, "C_ic_msb", "C_ic_lsb")
    split(int(round(0.98 / bds_d1.BDS_PI * 2 ** 31)), 21, 11,
          "i_0_msb", "i_0_lsb")
    split(int(round(-8.08e-09 / bds_d1.BDS_PI * 2 ** 43)), 19, 5,
          "omegaDot_msb", "omegaDot_lsb")
    split(int(round(0.97187 / bds_d1.BDS_PI * 2 ** 31)), 27, 5,
          "omega_msb", "omega_lsb")
    deph["M_0"] = round(1.19731 / bds_d1.BDS_PI * 2 ** 31) \
        * 2.0 ** -31 * bds_d1.BDS_PI
    deph["omega_0"] = round(2.46209 / bds_d1.BDS_PI * 2 ** 31) \
        * 2.0 ** -31 * bds_d1.BDS_PI
    deph["sqrtA"] = round(6493.45 * 2 ** 19) * 2.0 ** -19
    deph["iDot"] = round(-4.9e-10 / bds_d1.BDS_PI * 2 ** 43) \
        * 2.0 ** -43 * bds_d1.BDS_PI
    deph["a2"] = 0.0

    sow0 = 345600
    subs = [bds_d1.encode_d2_subframe(1 + (i % 10), deph,
                                      int(sow0 + 0.6 * i))
            for i in range(52)]
    bits_pm = 1 - 2 * np.concatenate(subs).astype(np.float64)
    i_p = _epochs(bits_pm, 2, None, lead_symbols=41, drop=0, seed=18)
    eph, start, tow = decode_channel(FakeTrack(i_p, prn=3), 0, cfg, sig)
    assert eph is not None and bds_d1.has_d2_ephemeris(eph)
    assert eph["is_geo"]
    assert tow == sow0
    assert start == 41 * 2
    for k, v in [("M_0", deph["M_0"]), ("e", 0.0096785),
                 ("sqrtA", deph["sqrtA"]), ("omega_0", deph["omega_0"]),
                 ("i_0", 0.98), ("t_oe", 345600.0)]:
        assert eph[k] == pytest.approx(v, rel=1e-6, abs=1e-9), k
