"""Minimal on-chip repro/check for correlate_bank_hbm (Mosaic, non-interpret).

Builds one HBM-fetch correlator call with L1CA-like shapes and asserts
parity with the VMEM-staged correlate_bank path.  Run on the TPU:

    python tools/repro_hbm.py
"""
import numpy as np
import jax
import jax.numpy as jnp

import cusdr_tpu  # noqa: F401  (forces x64, same as production)
from cusdr_tpu.ops.correlator import correlate_bank, correlate_bank_hbm

C = 16
blk_pad = 18048
k = 9
wlen = ((blk_pad + 2 * k + 2 + 127) // 128) * 128
S = blk_pad * 4
TL = wlen + 256

rng = np.random.default_rng(0)
sig_i = jnp.asarray(rng.integers(-127, 128, S, dtype=np.int8))
sig_q = jnp.asarray(rng.integers(-127, 128, S, dtype=np.int8))
wt = jnp.asarray(rng.integers(-1, 2, (C, TL), dtype=np.int8))
soff = jnp.asarray(rng.integers(0, S - blk_pad, C, dtype=np.int32))
woff = jnp.asarray(rng.integers(0, TL - wlen, C, dtype=np.int32))
wrow = jnp.arange(C, dtype=jnp.int32)
col = lambda x: jnp.asarray(x, jnp.float32)[:, None]
alpha = col(rng.random(C))
remc = col(rng.random(C))
shi = col(rng.random(C))
slo = col(rng.random(C) * 0.01)
bsz = col(np.full(C, blk_pad - 64))

out_hbm = jax.jit(lambda *a: correlate_bank_hbm(
    *a, k=k, blk_pad=blk_pad, wlen=wlen))(
    soff, woff, wrow, alpha, remc, shi, slo, bsz, sig_i, sig_q, wt)
out_hbm = np.asarray(out_hbm)
print("HBM kernel compiled + ran:", out_hbm.shape)

si = jax.vmap(lambda o: jax.lax.dynamic_slice(sig_i, (o,), (blk_pad,)))(soff)
sq = jax.vmap(lambda o: jax.lax.dynamic_slice(sig_q, (o,), (blk_pad,)))(soff)
wts = jax.vmap(lambda t, s0: jax.lax.dynamic_slice(t, (s0,), (wlen,)))(
    wt, woff)
out_vmem = np.asarray(jax.jit(lambda *a: correlate_bank(*a, k=k))(
    alpha, remc, shi, slo, bsz, si, sq, wts))
err = np.max(np.abs(out_hbm - out_vmem) / (np.abs(out_vmem) + 1.0))
print("max rel err vs VMEM-staged:", err)
assert err < 1e-5, err
print("PASS")
