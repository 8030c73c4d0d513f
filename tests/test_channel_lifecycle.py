"""Channel health lifecycle: one SV disappears mid-run; the receiver must
drop that channel (PLL lock detector gate, Calc_CNo_PLD.m NBD/NBP) and
keep producing position fixes on the remaining satellites — the
per-channel generalization of the reference's out-of-data exit
(GPS/GPS_L1CA/include/tracking.m:241-245) and channel status states
(showChannelStatus.m)."""

import numpy as np
import pytest

from cusdr_tpu import get_config
from cusdr_tpu.io.scenario import make_gps_scenario
from cusdr_tpu.io.synth import quantize_iq_int8, synthesize_if
from cusdr_tpu.receiver import Receiver
from cusdr_tpu.signals.defs import get_signal

STOP_MS = 20_000.0


@pytest.fixture(scope="module")
def scene():
    cfg = get_config("gps_l1ca", sampling_freq=2.048e6, if_freq=7000.0,
                     acq_satellite_list=tuple(range(1, 33)),
                     acq_non_coh_time=12, use_trop_corr=False,
                     ms_to_process=40_000, lock_detect=True)
    sig = get_signal("gps_l1ca")
    scn = make_gps_scenario(cfg, sig, n_svs=6, duration_s=40.0,
                            cn0_dbhz=46.0)
    dead = scn.svs[2]
    dead.stop_ms = STOP_MS
    samples = quantize_iq_int8(
        synthesize_if(cfg, sig, scn.svs, num_ms=40_500, seed=7))
    res = Receiver(cfg).run(samples)
    return cfg, sig, scn, dead.prn, res


def test_dead_channel_dropped(scene):
    cfg, sig, scn, dead_prn, res = scene
    trk = res.track
    ci = list(trk.prns).index(dead_prn)
    # dropped within a few lock-detector superblocks of the blackout
    assert trk.status[ci] == '-'
    assert STOP_MS < trk.active_until[ci] < STOP_MS + 5_000
    # outputs are zeroed past the drop (frozen state, masked epochs)
    assert np.all(trk.blksize[ci, int(trk.active_until[ci]):] == 0)


def test_live_channels_keep_tracking(scene):
    cfg, sig, scn, dead_prn, res = scene
    trk = res.track
    n_epochs = trk.i_p.shape[1]
    for c, prn in enumerate(trk.prns):
        if prn == dead_prn:
            continue
        assert trk.status[c] == 'T'
        assert trk.active_until[c] == n_epochs


def test_fix_continues_after_blackout(scene):
    cfg, sig, scn, dead_prn, res = scene
    assert res.nav is not None
    ms = np.asarray(res.nav.curr_meas_sample) / cfg.sampling_freq * 1e3
    after = ms > STOP_MS + 6_000
    assert after.sum() >= 15, "no fixes after the blackout"
    err = np.sqrt((np.asarray(res.nav.X) - scn.rx_ecef[0]) ** 2
                  + (np.asarray(res.nav.Y) - scn.rx_ecef[1]) ** 2
                  + (np.asarray(res.nav.Z) - scn.rx_ecef[2]) ** 2)
    assert err[after].mean() < 20.0, err[after].mean()
    # the dead SV contributes no measurements after its drop: fixes use
    # <= 5 satellites there (its elevation slot is NaN)
    for m in np.nonzero(after)[0]:
        assert np.sum(np.isfinite(res.nav.el[m])) <= 5
