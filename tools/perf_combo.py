#!/usr/bin/env python
"""Probe: time-parallel tracking with the Pallas correlator bank (run on
the real TPU).  Locates the best shipped configuration for bench.py."""

import dataclasses
import time

import jax
import jax.numpy as jnp
import numpy as np

from cusdr_tpu import get_config
from cusdr_tpu.signals.defs import get_signal
from cusdr_tpu.tracking.engine import (build_replica_tables,
                                       init_channel_state,
                                       make_track_params, track_superblock)
from cusdr_tpu.parallel.timeblocks import _track_blocks

N_EPOCHS = 2000


def timeit(fn, *args, n=3):
    fn(*args)
    best = np.inf
    for _ in range(n):
        t0 = time.perf_counter()
        r = fn(*args)
        jax.tree.map(lambda x: np.asarray(x), r)
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    cfg = get_config("gps_l1ca")
    sig = get_signal("gps_l1ca")
    spc = cfg.samples_per_code
    rng = np.random.default_rng(0)
    n_channels = cfg.num_channels
    n_samples = (N_EPOCHS + 4) * spc
    samples = rng.integers(-16, 16, 2 * n_samples).astype(np.int8)
    channels = [(1 + k, cfg.if_freq + 500.0 * (k - 6), k * 1499)
                for k in range(n_channels)]
    dops = [c[1] - cfg.if_freq for c in channels]
    base_params = make_track_params(cfg, sig)
    ctabs_np, ptabs_np = build_replica_tables(cfg, sig, base_params,
                                              channels, dops)
    ctabs = jnp.asarray(ctabs_np)
    ptabs = jnp.asarray(ptabs_np)
    state = init_channel_state(channels, sig.chip_rate_hz,
                               dopplers=dops,
                               carrier_freq_hz=sig.carrier_freq_hz)
    samples_d = jnp.asarray(samples)
    print("device:", jax.devices()[0])

    for use_pallas in (False, True):
        params = dataclasses.replace(base_params, use_pallas=use_pallas)

        def run_seq(samples_d, state, params=params):
            st, outs = track_superblock(samples_d, jnp.int64(0), ctabs,
                                        ptabs, state, params, N_EPOCHS)
            return st.carr_freq

        t = timeit(run_seq, samples_d, state)
        print(f"seq      pallas={use_pallas}:  {t*1e3:8.1f} ms  "
              f"{N_EPOCHS*spc/t/1e6:7.1f} Msps")

        for n_blocks in (8, 40, 100, 200):
            if N_EPOCHS % n_blocks:
                continue
            epb = N_EPOCHS // n_blocks
            blk_len = (epb + 4) * spc
            sbs = np.stack([samples[2 * b * epb * spc:
                                    2 * (b * epb * spc + blk_len)]
                            for b in range(n_blocks)])
            starts = jnp.asarray(
                np.arange(n_blocks, dtype=np.int64) * epb * spc)
            st_b = jax.tree.map(lambda x: jnp.stack([x] * n_blocks), state)
            sbs_d = jnp.asarray(sbs)

            def run_tp(sbs_d, starts, st_b, epb=epb, params=params):
                st, outs = _track_blocks(sbs_d, starts, ctabs, ptabs,
                                         st_b, params, epb)
                return st.carr_freq

            try:
                t = timeit(run_tp, sbs_d, starts, st_b)
                print(f"tp B={n_blocks:3d} pallas={use_pallas}:  "
                      f"{t*1e3:8.1f} ms  {N_EPOCHS*spc/t/1e6:7.1f} Msps")
            except Exception as e:
                print(f"tp B={n_blocks:3d} pallas={use_pallas}:  "
                      f"FAILED {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
