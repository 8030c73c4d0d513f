"""Time-block (sequence-parallel) tracking: concurrent blocks must match
sequential tracking after the per-block settle transient."""

import jax
import numpy as np
import pytest
from jax.sharding import Mesh

from cusdr_tpu import get_config
from cusdr_tpu.io.synth import SynthSV, quantize_iq_int8, synthesize_if
from cusdr_tpu.parallel.timeblocks import track_time_parallel
from cusdr_tpu.signals.defs import get_signal
from cusdr_tpu.tracking import track


@pytest.fixture(scope="module")
def scene():
    cfg = get_config("gps_l1ca", sampling_freq=2.048e6, if_freq=7000.0)
    sig = get_signal("gps_l1ca")
    rng = np.random.default_rng(0)
    svs = [SynthSV(prn=7, code_phase=1234.0, doppler_hz=2500.0,
                   cn0_dbhz=47,
                   nav_bits=rng.choice(np.asarray([-1, 1], np.int8), 300)),
           SynthSV(prn=13, code_phase=100.2, doppler_hz=-3200.0,
                   cn0_dbhz=45,
                   nav_bits=rng.choice(np.asarray([-1, 1], np.int8), 300))]
    iq = quantize_iq_int8(synthesize_if(cfg, sig, svs, num_ms=4200,
                                        seed=3))
    chans = [(7, 9500.0, 1234), (13, 3800.0, 101)]
    seq = track(cfg, sig, iq, chans, n_epochs=4000)
    mesh = Mesh(np.asarray(jax.devices()[:4]), ("tb",))
    par = track_time_parallel(cfg, sig, iq, chans, n_epochs=4000,
                              n_blocks=4, mesh=mesh)
    return cfg, seq, par


def test_carrier_matches_sequential(scene):
    cfg, seq, par = scene
    for c in range(2):
        for b in range(4):
            lo, hi = b * 1000 + 300, (b + 1) * 1000
            assert abs(seq.carr_freq[c, lo:hi].mean()
                       - par.carr_freq[c, lo:hi].mean()) < 1.0


def test_code_freq_matches_sequential(scene):
    cfg, seq, par = scene
    for c in range(2):
        for b in range(4):
            lo, hi = b * 1000 + 300, (b + 1) * 1000
            assert abs(seq.code_freq[c, lo:hi].mean()
                       - par.code_freq[c, lo:hi].mean()) < 0.05


def test_lock_quality_preserved(scene):
    """Steady-state correlation amplitude within a few % of sequential."""
    cfg, seq, par = scene
    for c in range(2):
        for b in range(4):
            lo, hi = b * 1000 + 300, (b + 1) * 1000
            env_s = np.hypot(seq.i_p[c, lo:hi], seq.q_p[c, lo:hi]).mean()
            env_p = np.hypot(par.i_p[c, lo:hi], par.q_p[c, lo:hi]).mean()
            assert env_p > 0.9 * env_s


def test_absolute_samples_continuous(scene):
    """Block stitching: absolute sample indices must stay monotonic with
    one-code-period steps across block boundaries."""
    cfg, seq, par = scene
    spc = cfg.samples_per_code
    ds = np.diff(par.abs_sample[0])
    assert np.all(ds > 0)
    assert np.abs(ds - spc).max() <= spc  # boundary step may differ by <1 period
