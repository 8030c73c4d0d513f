"""Decompose the flat time-parallel step cost with the HBM-fetch kernel.

A: correlate_bank_hbm alone at C=480 (chained iterations)
B: one full _track_blocks_flat scan step (E=1) amortized
C: scan-step XLA overhead estimate (engine f64/i64 bookkeeping)
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from cusdr_tpu import get_config
from cusdr_tpu.signals.defs import get_signal
from cusdr_tpu.ops.correlator import (correlate_bank_hbm, hbm_geometry,
                                      ALIGN)
from cusdr_tpu.tracking.engine import (_round_up, build_replica_tables,
                                       init_channel_state,
                                       make_track_params)

N_IT = 20


def timeit(fn, n=3):
    fn()
    best = np.inf
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


cfg = get_config("gps_l1ca")
sig = get_signal("gps_l1ca")
params = make_track_params(cfg, sig)
spc = cfg.samples_per_code
B, n_ch = 40, 12
C = B * n_ch
k = params.k_spacing
blk_pad = _round_up(params.blk, 128)
rows, tq_s, tq_w = hbm_geometry(blk_pad, k)
cs = C * spc
print(f"C={C} blk_pad={blk_pad} rows={rows} tq_s={tq_s} tq_w={tq_w}")

rng = np.random.default_rng(0)
NR = (64 * spc) // ALIGN + tq_s + 2
rec_i = jnp.asarray(rng.integers(-16, 16, (NR, 4, 128)), jnp.int8)
rec_q = jnp.asarray(rng.integers(-16, 16, (NR, 4, 128)), jnp.int8)
TQ = (blk_pad + 4096) // ALIGN + tq_w + 2
tab = jnp.asarray(rng.integers(-1, 2, (C, TQ, 4, 128)), jnp.int8)

q0 = jnp.asarray(rng.integers(0, NR - tq_s - 1, C), jnp.int32)
qt0 = jnp.asarray(rng.integers(0, TQ - tq_w - 1, C), jnp.int32)
rt0 = jnp.asarray(rng.integers(0, ALIGN, C), jnp.int32)
wrow = jnp.arange(C, dtype=jnp.int32)
f32 = lambda x: jnp.asarray(x, jnp.float32)
alpha = f32(rng.random(C))
remc = f32(rng.random(C))
shi = f32(rng.random(C))
slo = f32(rng.random(C) * 0.01)
bsz = f32(np.full(C, spc))
rst = f32(rng.integers(0, ALIGN, C))


@jax.jit
def run_kernel(q, qt, rt):
    out = None
    for _ in range(N_IT):
        out = correlate_bank_hbm(q, wrow, qt, rt, alpha, remc, shi, slo,
                                 bsz, rst, rec_i, rec_q, tab,
                                 k=k, blk_pad=blk_pad)
        d = (out[:, 0].astype(jnp.int32) & 1)
        q = (q + d) % (NR - tq_s - 1)
    return out[:1, :1]


t = timeit(lambda: np.asarray(run_kernel(q0, qt0, rt0))) / N_IT
print(f"A hbm kernel alone C={C}: {t*1e3:8.3f} ms/it  "
      f"{t/cs*1e9:6.3f} ns/ch-samp")

# ---- B: full flat scan steps --------------------------------------------
from cusdr_tpu.parallel.timeblocks import (_track_blocks_flat,
                                           predict_block_states)

import os
N_EP_REC = int(os.environ.get('NEPREC', '64'))
n_samples = (N_EP_REC + 4) * spc
samples = rng.integers(-16, 16, 2 * n_samples).astype(np.int8)
channels = [(1 + c, cfg.if_freq + 500.0 * (c - 6), c * 1499)
            for c in range(n_ch)]
dops = [c[1] - cfg.if_freq for c in channels]
ctabs, ptabs = build_replica_tables(cfg, sig, params, channels, dops)
epb = max(N_EP_REC // B, 1)
st_b, _ = predict_block_states(channels, cfg, sig, B, epb)
sd = jnp.asarray(samples)
ct = jnp.asarray(ctabs)
pt = jnp.asarray(ptabs)

for E in (1, 10, int(os.environ.get('EFULL', '10'))):
    def run_flat():
        st, outs = _track_blocks_flat(sd, ct, pt, st_b, params, E, B)
        return np.asarray(st.carr_freq)

    t = timeit(run_flat)
    print(f"B flat E={E}:  {t*1e3:8.3f} ms total  "
          f"{t/E*1e3:8.3f} ms/step  "
          f"{t/(E*cs)*1e9:6.3f} ns/ch-samp")
