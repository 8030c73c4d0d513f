"""On-chip check of the aligned-DMA HBM correlator path (Mosaic,
non-interpret): compiles track_superblock with fetch_in_kernel on the
real TPU, asserts parity with the XLA-staged path, and times both.

    python -m tools.repro_hbm
"""
import dataclasses
import time

import numpy as np
import jax
import jax.numpy as jnp

from cusdr_tpu import get_config
from cusdr_tpu.signals.defs import get_signal
from cusdr_tpu.tracking.engine import (build_replica_tables,
                                       init_channel_state,
                                       make_track_params,
                                       track_superblock)


def run(signal="gps_l1ca", fs=18e6, pilot=False, n_epochs=50, n_ch=12):
    cfg = get_config(signal, sampling_freq=fs, if_freq=20e3)
    if pilot:
        cfg = cfg.replace(pilot_trk_flag=1)
    sig = get_signal(signal)
    params = make_track_params(cfg, sig)
    spc = cfg.samples_per_code
    rng = np.random.default_rng(7)
    samples = rng.integers(-16, 16, 2 * (n_epochs + 4) * spc).astype(
        np.int8)
    channels = [(1 + c, cfg.if_freq + 200.0 * c - 1000.0, 101 + 997 * c)
                for c in range(n_ch)]
    dops = [c[1] - cfg.if_freq for c in channels]
    ctabs, ptabs = build_replica_tables(cfg, sig, params, channels, dops)
    state = init_channel_state(channels, sig.chip_rate_hz, dopplers=dops,
                               carrier_freq_hz=sig.carrier_freq_hz)
    sd, ct, pt = jnp.asarray(samples), jnp.asarray(ctabs), jnp.asarray(
        ptabs)

    outs = {}
    times = {}
    for name, p in [
        ("xla", dataclasses.replace(params, use_pallas=False,
                                    fetch_in_kernel=False)),
        ("pallas_vmem", dataclasses.replace(params, use_pallas=True,
                                            fetch_in_kernel=False)),
        ("pallas_hbm", dataclasses.replace(params, use_pallas=True,
                                           fetch_in_kernel=True)),
    ]:
        if n_epochs > 8 and name == "xla":
            continue  # XLA compile takes minutes at scale; skip for perf runs
        t0 = time.perf_counter()
        st, out = track_superblock(sd, jnp.int64(0), ct, pt, state, p,
                                   n_epochs)
        ip = np.asarray(out.i_p)
        t_compile = time.perf_counter() - t0
        t0 = time.perf_counter()
        st, out = track_superblock(sd, jnp.int64(0), ct, pt, state, p,
                                   n_epochs)
        np.asarray(out.i_p)
        times[name] = time.perf_counter() - t0
        outs[name] = out
        rate = n_epochs * spc * n_ch / times[name]
        print(f"{signal} {name:12s}: compile {t_compile:6.1f}s  "
              f"run {times[name]*1e3:8.2f} ms  "
              f"{1e9 / rate:6.3f} ns/ch-samp")

    # parity reference is the PROVEN VMEM Pallas kernel: both kernels
    # share Mosaic's sin/cos rounding, so they agree to f32 ulp level;
    # XLA's transcendentals differ at ~2e-3 of the noise-sum scale and
    # closed-loop feedback on pure noise amplifies that into trajectory
    # divergence — not a meaningful comparison beyond a few epochs.
    ok = True
    for name in ("i_e", "q_e", "i_p", "q_p", "i_l", "q_l",
                 "pilot_ip", "pilot_qp"):
        a = np.asarray(getattr(outs["pallas_vmem"], name))
        b = np.asarray(getattr(outs["pallas_hbm"], name))
        scale = np.abs(a).max() + 1.0
        err = np.abs(a - b).max() / scale
        if err > 1e-4:
            ok = False
            print(f"  PARITY FAIL {name}: rel err {err:.2e}")
    print(f"{signal}: vmem/hbm parity", "OK" if ok else "FAIL")
    assert ok


if __name__ == "__main__":
    run("gps_l1ca", 18e6, False)
    run("gal_e5a", 18e6, True, n_ch=8)
    print("PASS")
