"""Bisect: does the HBM kernel diverge from XLA on hardware at 1 scan step?"""
import dataclasses
import numpy as np
import jax.numpy as jnp
from cusdr_tpu import get_config
from cusdr_tpu.signals.defs import get_signal
from cusdr_tpu.tracking.engine import (build_replica_tables,
                                       init_channel_state,
                                       make_track_params, track_superblock)

cfg = get_config("gps_l1ca", sampling_freq=18e6, if_freq=20e3)
sig = get_signal("gps_l1ca")
params = make_track_params(cfg, sig)
spc = cfg.samples_per_code
rng = np.random.default_rng(7)
n_ch = 12
samples = rng.integers(-16, 16, 2 * 30 * spc).astype(np.int8)
channels = [(1 + c, cfg.if_freq + 200.0 * c - 1000.0, 101 + 997 * c)
            for c in range(n_ch)]
dops = [c[1] - cfg.if_freq for c in channels]
ctabs, ptabs = build_replica_tables(cfg, sig, params, channels, dops)
state = init_channel_state(channels, sig.chip_rate_hz, dopplers=dops,
                           carrier_freq_hz=sig.carrier_freq_hz)
sd, ct, pt = jnp.asarray(samples), jnp.asarray(ctabs), jnp.asarray(ptabs)

for n_epochs in (1,):
    outs = {}
    for name, p in [
        ("xla", dataclasses.replace(params, use_pallas=False,
                                    fetch_in_kernel=False)),
        ("vmem", dataclasses.replace(params, use_pallas=True,
                                     fetch_in_kernel=False)),
        ("hbm", dataclasses.replace(params, use_pallas=True,
                                    fetch_in_kernel=True)),
    ]:
        st, out = track_superblock(sd, jnp.int64(0), ct, pt, state, p,
                                   n_epochs)
        outs[name] = out
    for f in ("i_p", "q_p"):
        a = np.asarray(getattr(outs["xla"], f))
        scale = np.abs(a).max() + 1.0
        for other in ("vmem", "hbm"):
            b = np.asarray(getattr(outs[other], f))
            err = np.abs(a - b) / scale
            print(f"E={n_epochs} {f} xla-vs-{other}: max rel",
                  round(float(err.max()), 6))
        v = np.asarray(getattr(outs["vmem"], f))
        h = np.asarray(getattr(outs["hbm"], f))
        print(f"E={n_epochs} {f} vmem-vs-hbm: max rel",
              round(float(np.abs(v - h).max() / scale), 6))
