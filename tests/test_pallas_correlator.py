"""Parity: the fused Pallas correlator bank (interpret mode on CPU) must
match the XLA per-channel epoch path bit-for-bit in structure and to f32
rounding in values, including the pilot variant."""

import dataclasses

import jax
import numpy as np
import pytest

from cusdr_tpu import get_config
from cusdr_tpu.signals.defs import get_signal
from cusdr_tpu.tracking.engine import (build_replica_tables,
                                       init_channel_state,
                                       make_track_params,
                                       track_superblock)


@pytest.mark.parametrize("signal,fs,has_pilot,fetch_in_kernel", [
    ("gps_l1ca", 2.048e6, False, False),
    ("gal_e5a", 12.288e6, True, False),
    ("gps_l1ca", 2.048e6, False, True),
    ("gal_e5a", 12.288e6, True, True),
    # WB QMBOC dual pilot bank (B1C, pilot_trk_flag=2) — the composite
    # -sqrt(4/33)p61 - j sqrt(29/33)p11 combine runs IN-KERNEL
    ("bds_b1c", 16.368e6, 2, False),
    ("bds_b1c", 16.368e6, 2, True),
])
def test_pallas_matches_xla(signal, fs, has_pilot, fetch_in_kernel):
    cfg = get_config(signal, sampling_freq=fs, if_freq=7000.0)
    if has_pilot:
        cfg = cfg.replace(pilot_trk_flag=int(has_pilot))
    sig = get_signal(signal)
    params = make_track_params(cfg, sig)
    if not params.fast_code:
        pytest.skip("exact path signal")
    spc = cfg.samples_per_code
    n_epochs = 12
    n_ch = 3   # exercises padding to the 8-channel block
    rng = np.random.default_rng(7)
    samples = rng.integers(-16, 16, 2 * (n_epochs + 4) * spc).astype(
        np.int8)
    channels = [(1 + k, 7000.0 + 200.0 * k, 101 + 37 * k)
                for k in range(n_ch)]
    dops = [c[1] - cfg.if_freq for c in channels]
    ctabs, ptabs = build_replica_tables(cfg, sig, params, channels, dops)
    state = init_channel_state(channels, sig.chip_rate_hz, dopplers=dops,
                               carrier_freq_hz=sig.carrier_freq_hz)

    import jax.numpy as jnp
    sd = jnp.asarray(samples)
    ct = jnp.asarray(ctabs)
    pt = jnp.asarray(ptabs)

    p_xla = dataclasses.replace(params, use_pallas=False,
                                fetch_in_kernel=False)
    p_pl = dataclasses.replace(params, use_pallas=True,
                               fetch_in_kernel=fetch_in_kernel,
                               pallas_interpret=True)

    st_x, out_x = track_superblock(sd, jnp.int64(0), ct, pt, state,
                                   p_xla, n_epochs)
    st_p, out_p = track_superblock(sd, jnp.int64(0), ct, pt, state,
                                   p_pl, n_epochs)

    for name in ("i_e", "q_e", "i_p", "q_p", "i_l", "q_l",
                 "pilot_ip", "pilot_qp"):
        a = np.asarray(getattr(out_x, name))
        b = np.asarray(getattr(out_p, name))
        scale = np.abs(a).max() + 1.0
        assert np.allclose(a, b, atol=2e-4 * scale), (
            name, np.abs(a - b).max(), scale)
    # loop state converges identically to f32 rounding of the correlators
    # (the in-kernel-fetch path evaluates the carrier from a shifted
    # origin — remc' = remc - inc*r — and the dual-bank kernel combines
    # the QMBOC banks in a different f32 summation order, so states
    # differ by a few correlator ulps per epoch through the loop gains;
    # 1e-4 rad over 12 epochs is that rounding class, ~1.6e-5 cycles)
    for name in ("carr_freq", "code_freq", "rem_code_phase",
                 "rem_carr_phase"):
        a = np.asarray(getattr(st_x, name))
        b = np.asarray(getattr(st_p, name))
        assert np.allclose(a, b, rtol=1e-6, atol=1e-4), (name, a, b)
    assert np.array_equal(np.asarray(st_x.abs_sample),
                          np.asarray(st_p.abs_sample))


def test_nearest_tap_mode_parity_all_paths():
    """interp_taps=False (the reference's own ceil-index fidelity,
    tracking.m:252-270) must agree across the XLA epoch and both Mosaic
    kernels, and still achieve code/carrier lock."""
    import dataclasses

    import jax.numpy as jnp

    from cusdr_tpu import get_config
    from cusdr_tpu.io.synth import SynthSV, quantize_iq_int8, synthesize_if
    from cusdr_tpu.signals.defs import get_signal
    from cusdr_tpu.tracking.engine import (build_replica_tables,
                                           init_channel_state,
                                           make_track_params,
                                           track_superblock)

    cfg = get_config("gps_l1ca", sampling_freq=2.048e6, if_freq=7000.0,
                     interp_taps=False)
    sig = get_signal("gps_l1ca")
    params = make_track_params(cfg, sig)
    assert not params.interp_taps
    iq = quantize_iq_int8(synthesize_if(
        cfg, sig,
        [SynthSV(prn=7, code_phase=500.0, doppler_hz=1500.0,
                 cn0_dbhz=48)], num_ms=30, seed=4))
    chans = [(7, 8500.0, 500), (9, 6000.0, 77)]
    dops = [c[1] - cfg.if_freq for c in chans]
    ct, pt = build_replica_tables(cfg, sig, params, chans, dops)
    st0 = init_channel_state(chans, sig.chip_rate_hz, dopplers=dops,
                             carrier_freq_hz=sig.carrier_freq_hz)
    sd = jnp.asarray(iq.view(np.uint16))
    ctd, ptd = jnp.asarray(ct), jnp.asarray(pt)
    res = {}
    for name, p in [
        ("xla", params),
        ("vmem", dataclasses.replace(params, use_pallas=True,
                                     fetch_in_kernel=False,
                                     pallas_interpret=True)),
        ("hbm", dataclasses.replace(params, use_pallas=True,
                                    fetch_in_kernel=True,
                                    pallas_interpret=True)),
    ]:
        _, out = track_superblock(sd, jnp.int64(0), ctd, ptd, st0, p, 20)
        res[name] = np.asarray(out.i_p)
    for k in ("vmem", "hbm"):
        d = np.abs(res[k] - res["xla"]).max() / (np.abs(res["xla"]).max()
                                                 + 1)
        assert d < 2e-4, (k, d)
    assert np.abs(res["xla"][5:, 0]).mean() > 500   # locked
