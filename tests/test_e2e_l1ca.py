"""Golden end-to-end test: GPS L1 C/A from IF samples to position fix.

A geometrically consistent 6-SV scene (Sagnac delays, code/carrier Doppler
+ rate, LNAV messages with valid parity) is synthesized; the full pipeline
acquisition → tracking → frame sync → ephemeris decode → pseudoranges →
least squares must recover the surveyed antenna position.  This exercises
every layer the reference exercises with recorded IF data (SURVEY.md §4)
but with exact ground truth.  Runtime ~2 min on CPU — it is the flagship
validation of the framework.
"""

import numpy as np
import pytest

from cusdr_tpu import get_config
from cusdr_tpu.signals.defs import get_signal
from cusdr_tpu.io.synth import synthesize_if, quantize_iq_int8
from cusdr_tpu.io.scenario import make_gps_scenario
from cusdr_tpu.receiver import Receiver


@pytest.fixture(scope="module")
def e2e():
    cfg = get_config("gps_l1ca", sampling_freq=2.048e6, if_freq=7000.0,
                     acq_satellite_list=tuple(range(1, 33)),
                     acq_non_coh_time=12, use_trop_corr=False,
                     ms_to_process=40_000)
    sig = get_signal("gps_l1ca")
    scn = make_gps_scenario(cfg, sig, n_svs=6, duration_s=40.0,
                            cn0_dbhz=46.0)
    samples = quantize_iq_int8(
        synthesize_if(cfg, sig, scn.svs, num_ms=40_500, seed=7))
    res = Receiver(cfg).run(samples)
    return cfg, sig, scn, res


def test_acquires_all_svs(e2e):
    cfg, sig, scn, res = e2e
    acquired = {p for p, *_ in res.channels}
    assert {sv.prn for sv in scn.svs} <= acquired


def test_nav_solution_exists(e2e):
    cfg, sig, scn, res = e2e
    assert res.nav is not None
    assert len(res.nav.X) >= 60   # ≥60 fixes over ~36 s at 500 ms cadence


def test_position_accuracy(e2e):
    """3D error must stay at GNSS-typical meter level (clean signal,
    46 dB-Hz, DOP ~3)."""
    cfg, sig, scn, res = e2e
    err = np.sqrt((np.asarray(res.nav.X) - scn.rx_ecef[0]) ** 2
                  + (np.asarray(res.nav.Y) - scn.rx_ecef[1]) ** 2
                  + (np.asarray(res.nav.Z) - scn.rx_ecef[2]) ** 2)
    assert err.mean() < 15.0, err.mean()
    assert err.max() < 50.0, err.max()


def test_geodetic_outputs(e2e):
    cfg, sig, scn, res = e2e
    lat0, lon0, h0 = scn.rx_llh
    assert np.mean(res.nav.latitude) == pytest.approx(lat0, abs=3e-4)
    assert np.mean(res.nav.longitude) == pytest.approx(lon0, abs=3e-4)
    assert np.mean(res.nav.height) == pytest.approx(h0, abs=30.0)
    assert res.nav.utm_zone == 13


def test_decoded_ephemeris_matches_truth(e2e):
    """Ephemeris decoded off the air must round-trip the scenario values."""
    from cusdr_tpu.receiver import decode_nav_channel
    cfg, sig, scn, res = e2e
    ch = 0
    prn = res.track.prns[ch]
    eph, start, tow = decode_nav_channel(res.track, ch, cfg, sig)
    assert eph is not None
    truth = scn.eph_by_prn[prn]
    for k in ("e", "sqrtA", "M_0", "omega_0", "i_0", "omega", "t_oe"):
        assert eph[k] == pytest.approx(truth[k], rel=1e-6,
                                       abs=abs(truth[k]) * 1e-6 + 1e-9), k


def test_elevations_plausible(e2e):
    """Solver elevations should match scenario geometry within a degree."""
    cfg, sig, scn, res = e2e
    el = res.nav.el[-1]
    for ch, prn in enumerate(res.track.prns):
        if np.isfinite(el[ch]):
            assert el[ch] == pytest.approx(scn.elevations[prn], abs=1.5)
