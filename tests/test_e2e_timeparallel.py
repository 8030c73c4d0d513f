"""End-to-end PVT through the time-parallel tracking path.

The flagship L1CA scene (6 SVs, Sagnac-consistent geometry, LNAV) is
processed by Receiver.run with cfg.time_blocks > 1 — the sequence-parallel
engine (parallel/timeblocks.py) — in both modes:

  * state handoff (handoff_iters=1, shipped default): stitched exactly,
    measurements usable everywhere;
  * predict-then-correct (handoff_iters=0): nav_solve must mask the
    per-block re-convergence transients (receiver.py settle masking).

Position accuracy must match the sequential flagship bound
(tests/test_e2e_l1ca.py), proving the parallel axis is production-usable,
not bench-only.
"""

import numpy as np
import pytest

from cusdr_tpu import get_config
from cusdr_tpu.io.scenario import make_gps_scenario
from cusdr_tpu.io.synth import quantize_iq_int8, synthesize_if
from cusdr_tpu.receiver import Receiver
from cusdr_tpu.signals.defs import get_signal


@pytest.fixture(scope="module")
def scene():
    cfg = get_config("gps_l1ca", sampling_freq=2.048e6, if_freq=7000.0,
                     acq_satellite_list=tuple(range(1, 33)),
                     acq_non_coh_time=12, use_trop_corr=False,
                     ms_to_process=40_000)
    sig = get_signal("gps_l1ca")
    scn = make_gps_scenario(cfg, sig, n_svs=6, duration_s=40.0,
                            cn0_dbhz=46.0)
    samples = quantize_iq_int8(
        synthesize_if(cfg, sig, scn.svs, num_ms=40_500, seed=7))
    return cfg, sig, scn, samples


def _errors(res, scn):
    return np.sqrt((np.asarray(res.nav.X) - scn.rx_ecef[0]) ** 2
                   + (np.asarray(res.nav.Y) - scn.rx_ecef[1]) ** 2
                   + (np.asarray(res.nav.Z) - scn.rx_ecef[2]) ** 2)


def test_pvt_through_handoff_blocks(scene):
    cfg, sig, scn, samples = scene
    res = Receiver(cfg.replace(time_blocks=8, handoff_iters=1)).run(samples)
    assert res.nav is not None
    assert res.track.settle_epochs == 0
    assert res.track.n_blocks == 8
    assert len(res.nav.X) >= 60
    err = _errors(res, scn)
    assert err.mean() < 15.0, err.mean()
    assert err.max() < 50.0, err.max()


def test_pvt_through_predict_blocks(scene):
    """Predict-only mode: measurement epochs inside each block's settle
    transient are masked by nav_solve; the fix must survive on the rest."""
    cfg, sig, scn, samples = scene
    res = Receiver(cfg.replace(time_blocks=4, handoff_iters=0,
                               settle_epochs=300)).run(samples)
    assert res.nav is not None
    assert res.track.settle_epochs == 300
    # some measurements were masked, but enough remain for ~30 s of fixes
    assert len(res.nav.X) >= 40
    err = _errors(res, scn)
    assert err.mean() < 15.0, err.mean()
