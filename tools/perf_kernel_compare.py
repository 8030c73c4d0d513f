#!/usr/bin/env python
"""Compare the two Mosaic correlator formulations at bank scale.

A: correlate_bank — operands pre-staged as [C, blk] arrays, Pallas
   auto-pipelines (8, blk) blocks; the body computes ALL 8 channels per
   vector op (amortized op issue).
B: correlate_bank_hbm — in-kernel DMA windows, per-channel (rows, 128)
   compute loop.

Same DMA traffic either way (A's staging is the pallas pipeline); a
large A-vs-B gap means the next multiplier is batching B's compute
across channels, not fetch changes.
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

from cusdr_tpu.ops.correlator import (correlate_bank, correlate_bank_hbm,
                                      hbm_geometry, ALIGN)
from cusdr_tpu.tracking.engine import _round_up

import os
C = int(os.environ.get("PKC_C", 1200))
BLK_PAD = int(os.environ.get("PKC_BLK", 18048))
ONLY = os.environ.get("PKC_ONLY", "")
K = 2
N_IT = 20


def timeit(fn, n=3):
    fn()
    best = np.inf
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    rng = np.random.default_rng(0)
    wlen = _round_up(BLK_PAD + 2 * K + 2, 128)
    col = lambda x: jnp.asarray(x.astype(np.float32)[:, None])
    alpha = col(rng.random(C))
    remc = col(rng.random(C))
    shi = col(rng.random(C))
    slo = col(rng.random(C) * 0.01)
    bsz = col(np.full(C, BLK_PAD - 40.0))
    si = jnp.asarray(rng.integers(-16, 16, (C, BLK_PAD)).astype(np.int8))
    sq = jnp.asarray(rng.integers(-16, 16, (C, BLK_PAD)).astype(np.int8))
    wt = jnp.asarray(rng.integers(-1, 2, (C, wlen)).astype(np.int8))

    @jax.jit
    def runA():
        out = jnp.zeros((C, 8), jnp.float32)
        o = out
        for _ in range(N_IT):
            o = correlate_bank(alpha + o[0, 0] * 0, remc, shi, slo, bsz,
                               si, sq, wt, k=K)
        return o

    if ONLY != "B":
        tA = timeit(lambda: np.asarray(runA())) / N_IT
        print(f"A vmem-staged C={C} blk={BLK_PAD}: {tA*1e3:7.2f} ms/it  "
              f"{tA/(C*BLK_PAD)*1e9:0.4f} ns/ch-samp", flush=True)

    # B: hbm kernel with the same work
    rows, tq_s, tq_w = hbm_geometry(BLK_PAD, K)
    n_rec = C * BLK_PAD // 4  # arbitrary record sized >> window
    nr = n_rec // ALIGN + tq_s + 4
    sig3 = jnp.asarray(rng.integers(-16, 16, (nr, 4, 128)).astype(np.int8))
    sgq3 = jnp.asarray(rng.integers(-16, 16, (nr, 4, 128)).astype(np.int8))
    ntq = max(-(-wlen // ALIGN), tq_w) + tq_w
    wt4 = jnp.asarray(rng.integers(-1, 2, (12, ntq, 4, 128)).astype(np.int8))
    q = jnp.asarray((rng.integers(0, nr - tq_s - 2, C)).astype(np.int32))
    wrow = jnp.asarray((np.arange(C) % 12).astype(np.int32))
    qt = jnp.asarray(rng.integers(0, ntq - tq_w - 1, C).astype(np.int32))
    rt = jnp.asarray(rng.integers(0, ALIGN, C).astype(np.int32))
    rstart = col(rng.integers(0, ALIGN, C))
    f32 = lambda x: jnp.asarray(x.astype(np.float32))
    a1 = f32(rng.random(C)); rc = f32(rng.random(C))
    sh = f32(rng.random(C)); sl = f32(rng.random(C) * 0.01)
    bz = f32(np.full(C, BLK_PAD - 40.0)); rs = f32(rng.integers(0, ALIGN, C))

    @jax.jit
    def runB():
        o = jnp.zeros((C, 8), jnp.float32)
        for _ in range(N_IT):
            o = correlate_bank_hbm(q, wrow, qt, rt, a1 + o[0, 0] * 0, rc,
                                   sh, sl, bz, rs, sig3, sgq3, wt4,
                                   k=K, blk_pad=BLK_PAD)
        return o

    if ONLY != "A":
        tB = timeit(lambda: np.asarray(runB())) / N_IT
        print(f"B hbm-fetch   C={C} blk={BLK_PAD}: {tB*1e3:7.2f} ms/it  "
              f"{tB/(C*BLK_PAD)*1e9:0.4f} ns/ch-samp", flush=True)


if __name__ == "__main__":
    main()
