#!/usr/bin/env python
"""Scaling probe: flat time-parallel bank throughput vs block count.

Fixed 10 s 18 Msps record, total epochs constant; more blocks B means
fewer scan steps (epb = E/B) of a wider (12*B)-row bank.  If the
per-step cost splits as t = epb * overhead + kernel_const, throughput
keeps rising with B until the kernel dominates — locating the knee
tells whether the next multiplier is block count or an in-kernel
multi-epoch rewrite.
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.append(str(Path(__file__).resolve().parents[1]))

from cusdr_tpu.runtime.cache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp

from cusdr_tpu import get_config
from cusdr_tpu.signals.defs import get_signal
from cusdr_tpu.tracking.engine import (build_replica_tables,
                                       init_channel_state,
                                       make_track_params)
from cusdr_tpu.parallel.timeblocks import _track_blocks_flat


def main():
    cfg = get_config("gps_l1ca")
    sig = get_signal("gps_l1ca")
    import dataclasses, os
    params = make_track_params(cfg, sig)
    if os.environ.get("PFS_NEAREST"):
        params = dataclasses.replace(params, interp_taps=False)
    spc = cfg.samples_per_code
    n_epochs = 10_000
    n_ch = cfg.num_channels
    rng = np.random.default_rng(0)
    samples = rng.integers(-16, 16,
                           2 * (n_epochs + 4) * spc).astype(np.int8)
    channels = [(1 + k, cfg.if_freq + 500.0 * (k - 6), k * 1499)
                for k in range(n_ch)]
    dops = [c[1] - cfg.if_freq for c in channels]
    ct, pt = build_replica_tables(cfg, sig, params, channels, dops)
    ctd, ptd = jnp.asarray(ct), jnp.asarray(pt)
    state = init_channel_state(channels, sig.chip_rate_hz, dopplers=dops,
                               carrier_freq_hz=sig.carrier_freq_hz)
    samples_d = jnp.asarray(samples.view(np.uint16))
    jax.block_until_ready(samples_d)

    import os as _os
    blist = (100,) if _os.environ.get("PFS_NEAREST") else (50, 100, 200, 400, 500)
    for n_blocks in blist:
        epb = n_epochs // n_blocks
        starts = jnp.asarray(
            np.arange(n_blocks, dtype=np.int64) * (epb * spc))
        st_b = jax.tree.map(lambda x: jnp.stack([x] * n_blocks), state)
        st_b = st_b._replace(abs_sample=st_b.abs_sample
                             + starts[:, None])

        def run():
            st, outs = _track_blocks_flat(samples_d, ctd, ptd, st_b,
                                          params, epb, n_blocks)
            return np.asarray(st.carr_freq)

        run()                                    # compile
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            run()
            best = min(best, time.perf_counter() - t0)
        rate = n_epochs * spc / best
        print(f"B={n_blocks:4d} epb={epb:4d} rows={12*n_blocks:5d}: "
              f"{best*1e3:8.1f} ms  {rate/1e6:8.1f} Msamp/s  "
              f"{rate/cfg.sampling_freq:6.1f}x RT", flush=True)


if __name__ == "__main__":
    main()
