#!/usr/bin/env python
"""Decompose the time-parallel tracking step cost on the real TPU.

The axon tunnel adds ~25 ms per host<->device sync, so every probe runs
N iterations inside one jit (chained by a data dependency) and fetches a
scalar; per-iteration cost = total / N.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from cusdr_tpu import get_config
from cusdr_tpu.signals.defs import get_signal
from cusdr_tpu.tracking.engine import (make_track_params, _round_up)
from cusdr_tpu.ops.correlator import correlate_bank

N_IT = 20


def timeit_scan(step_fn, init, n_it=N_IT, n=3):
    """step_fn: carry -> carry (device arrays); returns s/iter."""
    @jax.jit
    def run():
        c = init
        for _ in range(n_it):
            c = step_fn(c)
        return c

    jax.tree.map(np.asarray, run())          # compile + warm
    best = np.inf
    for _ in range(n):
        t0 = time.perf_counter()
        jax.tree.map(np.asarray, run())
        best = min(best, time.perf_counter() - t0)
    return best / n_it


def main():
    cfg = get_config("gps_l1ca")
    sig = get_signal("gps_l1ca")
    spc = cfg.samples_per_code              # 18000
    params = make_track_params(cfg, sig)
    rng = np.random.default_rng(0)

    n_blocks, n_ch = 40, 12
    C = n_blocks * n_ch                     # 480 rows
    k = params.k_spacing
    blk_pad = _round_up(params.blk, 128)
    wlen = _round_up(blk_pad + 2 * k + 2, 128)
    cs = C * spc

    print(f"C={C} blk_pad={blk_pad} wlen={wlen} k={k} "
          f"use_pallas={params.use_pallas}")

    si = jnp.asarray(rng.integers(-16, 16, (C, blk_pad)), jnp.int8)
    sq = jnp.asarray(rng.integers(-16, 16, (C, blk_pad)), jnp.int8)
    wt = jnp.asarray(rng.integers(0, 2, (C, wlen)) * 2 - 1, jnp.int8)
    remc = jnp.asarray(rng.random((C, 1)), jnp.float32)
    shi = jnp.asarray(rng.random((C, 1)), jnp.float32)
    slo = jnp.asarray(rng.random((C, 1)), jnp.float32)
    bsz = jnp.full((C, 1), spc, jnp.float32)

    # ---- A: kernel alone (alpha fed back so iterations chain) -------------
    def step_a(alpha):
        out = correlate_bank(alpha, remc, shi, slo, bsz,
                             si, sq, wt, None, k=k)
        return (alpha + out[:1, :1] * 1e-20) % 1.0

    t = timeit_scan(step_a, jnp.full((C, 1), 0.5, jnp.float32))
    print(f"A kernel alone:      {t*1e3:8.3f} ms/it  "
          f"{t/cs*1e9:6.3f} ns/ch-samp")

    # ---- B: window staging alone -------------------------------------------
    n_samples = (60 + 4) * spc
    samples_i = jnp.asarray(rng.integers(-16, 16, n_samples), jnp.int8)
    offs0 = jnp.asarray(rng.integers(0, n_samples - blk_pad - 1, C),
                        jnp.int32)

    def step_b(offs):
        w = jax.vmap(lambda o: jax.lax.dynamic_slice(
            samples_i, (o,), (blk_pad,)))(offs)
        return (offs + w[:, 0].astype(jnp.int32)) % (n_samples - blk_pad)

    t = timeit_scan(step_b, offs0)
    print(f"B slice staging x1:  {t*1e3:8.3f} ms/it "
          f"({C * blk_pad / t / 1e9:6.1f} GB/s eff)")

    # ---- C: slices (x3) + kernel -------------------------------------------
    def step_c(carry):
        offs, alpha = carry
        si2 = jax.vmap(lambda o: jax.lax.dynamic_slice(
            samples_i, (o,), (blk_pad,)))(offs)
        sq2 = jax.vmap(lambda o: jax.lax.dynamic_slice(
            samples_i, (o + 1,), (blk_pad,)))(offs)
        out = correlate_bank(alpha, remc, shi, slo, bsz,
                             si2, sq2, wt, None, k=k)
        offs = (offs + out[:, 0].astype(jnp.int32) % 3) \
            % (n_samples - blk_pad)
        return offs, alpha

    t = timeit_scan(step_c, (offs0, jnp.full((C, 1), 0.5, jnp.float32)))
    print(f"C slices + kernel:   {t*1e3:8.3f} ms/it")

    # ---- E: sin/cos [C, blk_pad] --------------------------------------------
    ph0 = jnp.asarray(rng.random((C, blk_pad)), jnp.float32)

    def step_e(ph):
        return jnp.cos(ph) + jnp.sin(ph) * 1e-6

    t = timeit_scan(step_e, ph0)
    print(f"E sin+cos [C,blk]:   {t*1e3:8.3f} ms/it "
          f"({t/cs*1e9:6.3f} ns/elem)")

    # ---- F: f32 axpy roundtrip [C, blk_pad] ----------------------------------
    def step_f(x):
        return x * 1.0000001 + 1e-9

    t = timeit_scan(step_f, ph0)
    bw = C * blk_pad * 4 * 2 / t / 1e9
    print(f"F f32 axpy [C,blk]:  {t*1e3:8.3f} ms/it  ({bw:.0f} GB/s)")


if __name__ == "__main__":
    main()
