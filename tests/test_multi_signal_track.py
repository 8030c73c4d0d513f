"""Concurrent multi-signal tracking (the constellation/EP axis).

The reference processes each signal in a separate receiver run
(12 sibling directories, SURVEY.md §2.3); tracking/multi.py schedules
several signals' channel banks inside ONE program on a common subepoch
clock.  These tests pin (a) exact per-signal parity with standalone
single-signal runs at mixed integration periods (L1CA 1 ms + E1C 4 ms
on a 4 ms hyperepoch), and (b) value parity when every bank's channel
axis is sharded over a device mesh."""

import jax
import numpy as np
import pytest

from cusdr_tpu import get_config
from cusdr_tpu.io.synth import SynthSV, quantize_iq_int8, synthesize_if
from cusdr_tpu.signals.defs import get_signal
from cusdr_tpu.tracking import track, track_multi


@pytest.fixture(scope="module")
def scenes():
    rng = np.random.default_rng(0)
    # GPS L1CA band (1 ms epochs)
    cfg_a = get_config("gps_l1ca", sampling_freq=2.048e6, if_freq=7000.0)
    sig_a = get_signal("gps_l1ca")
    svs_a = [SynthSV(prn=7, code_phase=1234.0, doppler_hz=2500.0,
                     cn0_dbhz=47,
                     nav_bits=rng.choice(np.asarray([-1, 1], np.int8),
                                         60)),
             SynthSV(prn=13, code_phase=100.2, doppler_hz=-3200.0,
                     cn0_dbhz=45,
                     nav_bits=rng.choice(np.asarray([-1, 1], np.int8),
                                         60))]
    iq_a = quantize_iq_int8(synthesize_if(cfg_a, sig_a, svs_a,
                                          num_ms=1000, seed=3))
    chans_a = [(7, 9500.0, 1234), (13, 3800.0, 101)]

    # Galileo E1 band (4 ms epochs, BOC(1,1) + pilot) — different record
    cfg_b = get_config("gal_e1c", sampling_freq=4.096e6, if_freq=7000.0)
    sig_b = get_signal("gal_e1c")
    nav_b = rng.choice(np.asarray([-1, 1], np.int8), 300)
    svs_b = [SynthSV(prn=4, code_phase=2233.0, doppler_hz=800.0,
                     cn0_dbhz=48, nav_bits=nav_b)]
    iq_b = quantize_iq_int8(synthesize_if(cfg_b, sig_b, svs_b,
                                          num_ms=1000, seed=5))
    # second channel tracks noise only — present so the channel axis is
    # shardable over 2 devices; parity/lock checks use channel 0
    chans_b = [(4, 7800.0, 2233), (2, 7200.0, 500)]
    return (cfg_a, sig_a, iq_a, chans_a), (cfg_b, sig_b, iq_b, chans_b)


def test_mixed_period_parity_with_single_signal_runs(scenes):
    """L1CA (1 ms) + E1C (4 ms) tracked concurrently on a 4 ms
    hyperepoch must reproduce each standalone run's trajectory — the
    banks are independent, so co-scheduling may not change a single
    number."""
    spec_a, spec_b = scenes
    n_ms = 800
    multi = track_multi([spec_a, spec_b], n_ms=n_ms)
    solo_a = track(spec_a[0], spec_a[1], spec_a[2], spec_a[3],
                   n_epochs=n_ms)
    solo_b = track(spec_b[0], spec_b[1], spec_b[2], spec_b[3],
                   n_epochs=n_ms // 4)
    assert multi[0].i_p.shape == (2, n_ms)
    assert multi[1].i_p.shape == (2, n_ms // 4)
    for solo, got in ((solo_a, multi[0]), (solo_b, multi[1])):
        np.testing.assert_array_equal(got.abs_sample, solo.abs_sample)
        np.testing.assert_allclose(got.carr_freq, solo.carr_freq,
                                   rtol=0, atol=1e-9)
        np.testing.assert_allclose(got.i_p, solo.i_p,
                                   rtol=1e-6, atol=1e-3)
        np.testing.assert_allclose(got.q_p, solo.q_p,
                                   rtol=1e-6, atol=1e-3)


def test_sharded_channel_axis_value_parity(scenes):
    """Both banks sharded over a 2-device 'ch' mesh produce the same
    values as the unsharded concurrent run (GSPMD partitioning of every
    bank in the one program)."""
    from cusdr_tpu.parallel import make_mesh
    spec_a, spec_b = scenes
    if len(jax.devices()) < 2:
        pytest.skip("needs >= 2 devices")
    mesh = make_mesh(2)
    n_ms = 400
    ref = track_multi([spec_a, spec_b], n_ms=n_ms)
    got = track_multi([spec_a, spec_b], n_ms=n_ms, mesh=mesh)
    for r, g in zip(ref, got):
        np.testing.assert_array_equal(g.abs_sample, r.abs_sample)
        np.testing.assert_allclose(g.i_p, r.i_p, rtol=1e-6, atol=1e-3)
        np.testing.assert_allclose(g.carr_freq, r.carr_freq,
                                   rtol=0, atol=1e-9)


def test_locks_both_signals(scenes):
    """Physical sanity: both signals converge to carrier lock in the
    concurrent run (power on I, correct carrier frequency)."""
    spec_a, spec_b = scenes
    multi = track_multi([spec_a, spec_b], n_ms=800)
    # L1CA channel 0: doppler 2500 Hz at IF 7 kHz
    ca = multi[0]
    assert abs(ca.carr_freq[0, -100:].mean() - 9500.0) < 15.0
    ip = np.abs(ca.i_p[0, -200:]).mean()
    qp = np.abs(ca.q_p[0, -200:]).mean()
    assert ip > 3 * qp
    e1 = multi[1]
    assert abs(e1.carr_freq[0, -25:].mean() - 7800.0) < 10.0


def test_run_multi_receiver_level(tmp_path, scenes):
    """receiver.run_multi: per-signal acquisition, one concurrent
    tracking program, per-signal results — via on-disk IF files and the
    CLI entry (the reference would need two separate receiver runs)."""
    from cusdr_tpu.receiver import run_multi

    spec_a, spec_b = scenes
    cfg_a = spec_a[0].replace(
        file_name=str(tmp_path / "l1.bin"), ms_to_process=800,
        acq_satellite_list=(7, 13, 20), acq_non_coh_time=4,
        acq_threshold=2.5)
    spec_a[2].tofile(cfg_a.file_name)
    cfg_b = spec_b[0].replace(
        file_name=str(tmp_path / "e1.bin"), ms_to_process=800,
        acq_satellite_list=(2, 4), acq_non_coh_time=2,
        acq_threshold=2.5)
    spec_b[2].tofile(cfg_b.file_name)

    results = run_multi([(cfg_a, None), (cfg_b, None)])
    assert len(results) == 2
    ra, rb = results
    assert {7, 13} <= {p for p, *_ in ra.channels}
    assert 4 in {p for p, *_ in rb.channels}
    # both signals' banks tracked concurrently: locked prompt power
    ia = list(p for p, *_ in ra.channels).index(7)
    ip = np.abs(ra.track.i_p[ia, -200:]).mean()
    qp = np.abs(ra.track.q_p[ia, -200:]).mean()
    assert ip > 3 * qp
    ib = list(p for p, *_ in rb.channels).index(4)
    ipb = np.abs(rb.track.i_p[ib, -50:]).mean()
    qpb = np.abs(rb.track.q_p[ib, -50:]).mean()
    assert ipb > 2 * qpb
