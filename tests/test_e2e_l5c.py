"""GPS L5C golden end-to-end test: IF samples to position fix.

A geometrically consistent 4-SV L5 scene (10.23 Mcps I5/Q5 codes, NH10
data / NH20 pilot secondaries, rate-1/2 CNAV messages) runs through the
full pipeline — acquisition (incl. the NH-hypothesis fine stage) →
data+pilot tracking → NH10 despread → Viterbi+CRC CNAV decode →
quasi-Keplerian satpos → least-squares PVT.  The reference only ever
validates this chain on recorded IF data
(GPS/GPS_L5C/include/CNAVdecoding.m, postNavigation.m); here the ground
truth is exact.  Runtime ~2-3 min on CPU (wideband rates).
"""

import numpy as np
import pytest

from cusdr_tpu import get_config
from cusdr_tpu.io.scenario import make_generic_scenario
from cusdr_tpu.io.synth import quantize_iq_int8, synthesize_if
from cusdr_tpu.nav import cnav
from cusdr_tpu.orbits.cnav_kepler import sat_pos_cnav
from cusdr_tpu.receiver import Receiver
from cusdr_tpu.signals.defs import get_signal

MSG_S = 6.0          # one CNAV message at 50 bps = 6 s


def _cnav_eph(prn: int, toe: float, *, m0: float, omega0: float) -> dict:
    """CNAV MT10/11/30 ephemeris on the codec's field grids
    (cnav.MESSAGE_FIELDS scales), orbit near the GPS nominal shell."""
    rng = np.random.default_rng(prn + 100)
    toe = 300.0 * round(toe / 300.0)      # t_oe grid is 300 s (MT10)
    return dict(
        PRN=float(prn), weekNumber=1214.0, health=0.0, T_op=toe,
        URA_ED=1.0, t_oe=toe, t_oc=toe,
        deltaA=float(rng.uniform(-200.0, 200.0)), ADot=0.0,
        delta_n_0=float(rng.uniform(3.5e-9, 5.5e-9)), delta_n_0Dot=0.0,
        M_0=m0, e=float(rng.uniform(0.003, 0.02)),
        omega=float(rng.uniform(-np.pi, np.pi) * 0.99),
        omega_0=omega0, i_0=np.radians(55.0),
        delta_omegaDot=0.0, i_0Dot=0.0,
        C_is=float(rng.uniform(-2e-7, 2e-7)),
        C_ic=float(rng.uniform(-2e-7, 2e-7)),
        C_rs=float(rng.uniform(-80, 80)),
        C_rc=float(rng.uniform(150, 350)),
        C_us=float(rng.uniform(2e-6, 9e-6)),
        C_uc=float(rng.uniform(-6e-6, 6e-6)),
        a_f0=float(rng.uniform(-2e-4, 2e-4)), a_f1=0.0, a_f2=0.0,
        T_GD=float(rng.uniform(-8e-9, 8e-9)), ISC_L5I=0.0, ISC_L2C=0.0,
    )


def _nav_stream(eph, frame_t0):
    """±1 CNAV symbol stream at 10 ms/symbol from signal time frame_t0;
    message k spans [frame_t0 + 6k, frame_t0 + 6(k+1))."""
    mids = [10, 11, 30, 10, 11, 30]
    msgs = [cnav.encode_message(mid, eph,
                                int(frame_t0 + MSG_S * (k + 1)),
                                prn=int(eph["PRN"]))
            for k, mid in enumerate(mids)]
    return cnav.encode_symbol_stream(msgs).astype(np.int8)


@pytest.fixture(scope="module")
def e2e():
    cfg = get_config("gps_l5c", sampling_freq=12.288e6, if_freq=7000.0,
                     acq_satellite_list=tuple(range(1, 13)),
                     acq_non_coh_time=10, pilot_trk_flag=1,
                     use_trop_corr=False, ms_to_process=26_000)
    sig = get_signal("gps_l5c")
    scn = make_generic_scenario(
        cfg, sig, eph_factory=_cnav_eph, satpos_fn=sat_pos_cnav,
        nav_stream_fn=_nav_stream, frame_period_s=MSG_S,
        # 50 dB-Hz: the coarse stage correlates the 1 ms primary only
        # (GPS_L5C/include/acquisition.m), so NH10 transitions inside a
        # window cost up to |1-2phi| of the peak; at the speed-reduced
        # noncoh=10 (preset 25) a 47 dB-Hz SV can dip under the 4.5
        # preset threshold depending on its code-phase/NH alignment
        n_svs=4, duration_s=26.0, cn0_dbhz=50.0,
        prn_pool=range(1, 13))
    samples = quantize_iq_int8(
        synthesize_if(cfg, sig, scn.svs, num_ms=26_400, seed=11))
    res = Receiver(cfg).run(samples)
    return cfg, sig, scn, res


def test_acquires_all_svs(e2e):
    cfg, sig, scn, res = e2e
    acquired = {p for p, *_ in res.channels}
    assert {sv.prn for sv in scn.svs} <= acquired


def test_tracking_locks(e2e):
    cfg, sig, scn, res = e2e
    for c in range(len(res.track.prns)):
        ip = np.abs(res.track.i_p[c, -2000:]).mean()
        qp = np.abs(res.track.q_p[c, -2000:]).mean()
        assert ip > 2.5 * qp, (c, ip, qp)


def test_cnav_decode_through_pipeline(e2e):
    """Tracked-IF CNAV: MT10+11+30 decoded off the air match the
    broadcast values (CNAVdecoding.m + ephemeris.m path)."""
    from cusdr_tpu.nav.dispatch import decode_channel
    cfg, sig, scn, res = e2e
    decoded = 0
    for ch in range(len(res.track.prns)):
        eph, start, tow = decode_channel(res.track, ch, cfg, sig)
        if eph is None:
            continue
        decoded += 1
        truth = scn.eph_by_prn[res.track.prns[ch]]
        for k in ("e", "M_0", "omega_0", "i_0", "omega", "t_oe",
                  "deltaA", "a_f0"):
            # deltaA is broadcast at ICD scale 2^-9 m — the decode can
            # only be right to half that quantization step
            q = 2.0 ** -9 if k == "deltaA" else 0.0
            assert eph[k] == pytest.approx(
                truth[k], rel=1e-6,
                abs=abs(truth[k]) * 1e-6 + 1e-9 + q), k
        assert tow % MSG_S == 0
    assert decoded >= 4


def test_nav_solution_and_accuracy(e2e):
    cfg, sig, scn, res = e2e
    assert res.nav is not None
    assert len(res.nav.X) >= 5
    err = np.sqrt((np.asarray(res.nav.X) - scn.rx_ecef[0]) ** 2
                  + (np.asarray(res.nav.Y) - scn.rx_ecef[1]) ** 2
                  + (np.asarray(res.nav.Z) - scn.rx_ecef[2]) ** 2)
    assert err.mean() < 20.0, err.mean()
    assert err.max() < 60.0, err.max()
