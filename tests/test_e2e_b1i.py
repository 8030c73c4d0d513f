"""Golden end-to-end test #2: BeiDou B1I from IF samples to position fix.

Exercises the full non-GPS chain: 2046-chip code @ 2.046 Mcps, NH20
secondary on the data channel, D1 message (BCH(15,11) interleaved words),
BDS Keplerian orbits — acquisition → tracking → frame sync → ephemeris →
least squares against a known receiver position.
"""

import numpy as np
import pytest

from cusdr_tpu import get_config
from cusdr_tpu.constants import BDS_GM, BDS_OMEGA_E_DOT
from cusdr_tpu.io.scenario import make_generic_scenario, make_gps_eph
from cusdr_tpu.io.synth import quantize_iq_int8, synthesize_if
from cusdr_tpu.nav import bds_d1
from cusdr_tpu.orbits.kepler import sat_pos_kepler
from cusdr_tpu.receiver import Receiver
from cusdr_tpu.signals.defs import get_signal


def _bds_eph(prn, toe, *, m0, omega0):
    """D1-named ephemeris on a BDS MEO orbit (~27906 km)."""
    g = make_gps_eph(prn, toe, m0=m0, omega0=omega0)
    return dict(
        SatH1=0, IODC=prn, URAI=0, WN=810, IODE=prn,
        t_oc=toe, t_oe=toe, T_GD_1=g["T_GD"],
        alpha0=0.0, alpha1=0.0, alpha2=0.0, alpha3=0.0,
        beta0=0.0, beta1=0.0, beta2=0.0, beta3=0.0,
        a0=g["a_f0"], a1=g["a_f1"], a2=0.0,
        deltan=g["deltan"], C_uc=g["C_uc"], M_0=g["M_0"], e=g["e"],
        C_us=g["C_us"], C_rc=g["C_rc"], C_rs=g["C_rs"],
        sqrtA=5282.62 + (g["sqrtA"] - 5153.65),
        i_0=g["i_0"], C_ic=g["C_ic"], omegaDot=g["omegaDot"],
        C_is=g["C_is"], iDot=g["iDot"], omega_0=g["omega_0"],
        omega=g["omega"],
        # solver-facing aliases (nav/dispatch normalization)
        a_f0=g["a_f0"], a_f1=g["a_f1"], a_f2=0.0, T_GD=g["T_GD"],
    )


def _satpos(t, eph):
    return sat_pos_kepler(t, eph, gm=BDS_GM, omega_e_dot=BDS_OMEGA_E_DOT)


def _nav_stream(eph, frame_t0):
    toe_raw = int(round(eph["t_oe"] / 8.0))
    e = dict(eph, t_oe_msb=toe_raw >> 15, t_oe_lsb=toe_raw & 0x7FFF)
    frames = []
    for f in range(4):                      # 4 frames = 120 s of bits
        for i in range(5):
            sow = int(frame_t0) + 30 * f + 6 * i
            frames.append(bds_d1.encode_subframe(i + 1, e, sow))
    bits = np.concatenate(frames)
    return (2 * bits.astype(np.int8) - 1)


@pytest.fixture(scope="module")
def e2e():
    cfg = get_config("bds_b1i", sampling_freq=4.096e6, if_freq=7000.0,
                     acq_satellite_list=tuple(range(6, 38)),
                     acq_search_step=250.0, acq_non_coh_time=8,
                     use_trop_corr=False, ms_to_process=40_000)
    sig = get_signal("bds_b1i")
    scn = make_generic_scenario(
        cfg, sig, eph_factory=_bds_eph, satpos_fn=_satpos,
        nav_stream_fn=_nav_stream, frame_period_s=30.0,
        n_svs=6, duration_s=40.0, cn0_dbhz=46.0,
        prn_pool=range(6, 38))
    samples = quantize_iq_int8(
        synthesize_if(cfg, sig, scn.svs, num_ms=40_500, seed=9))
    res = Receiver(cfg).run(samples)
    return cfg, sig, scn, res


def test_acquires_all_svs(e2e):
    cfg, sig, scn, res = e2e
    acquired = {p for p, *_ in res.channels}
    assert {sv.prn for sv in scn.svs} <= acquired


def test_nav_solution(e2e):
    cfg, sig, scn, res = e2e
    assert res.nav is not None
    assert len(res.nav.X) >= 5


def test_position_accuracy(e2e):
    cfg, sig, scn, res = e2e
    err = np.sqrt((np.asarray(res.nav.X) - scn.rx_ecef[0]) ** 2
                  + (np.asarray(res.nav.Y) - scn.rx_ecef[1]) ** 2
                  + (np.asarray(res.nav.Z) - scn.rx_ecef[2]) ** 2)
    assert err.mean() < 20.0, err.mean()
    assert err.max() < 60.0, err.max()


def test_decoded_ephemeris(e2e):
    from cusdr_tpu.nav.dispatch import decode_channel
    cfg, sig, scn, res = e2e
    eph, start, sow = decode_channel(res.track, 0, cfg, sig)
    assert eph is not None
    prn = res.track.prns[0]
    truth = scn.eph_by_prn[prn]
    for k in ("e", "sqrtA", "M_0", "omega_0", "i_0", "omega", "t_oe"):
        assert eph[k] == pytest.approx(truth[k], rel=1e-6,
                                       abs=abs(truth[k]) * 1e-6 + 1e-9), k
