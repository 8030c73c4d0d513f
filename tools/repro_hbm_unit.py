"""Unit-level oracle check of correlate_bank_hbm on the chip."""
import numpy as np
import jax.numpy as jnp

from cusdr_tpu.ops.correlator import (correlate_bank_hbm, hbm_geometry,
                                      ALIGN)

import os
C = int(os.environ.get('C', 8))
blk_pad = int(os.environ.get('BLK', 2048))
k = 9
rows, tq_s, tq_w = hbm_geometry(blk_pad, k)
print("rows", rows, "tq_s", tq_s, "tq_w", tq_w)

rng = np.random.default_rng(3)
NR = (C * blk_pad * 2) // 512 + tq_s + 2
rec_i = rng.integers(-16, 16, NR * ALIGN).astype(np.int8)
rec_q = rng.integers(-16, 16, NR * ALIGN).astype(np.int8)
TQ = blk_pad // 512 + 16 + tq_w + 2
tab = rng.integers(-1, 2, (C, TQ * ALIGN)).astype(np.int8)

soff = rng.integers(0, (NR - tq_s - 1) * ALIGN, C)
o_tab = rng.integers(0, (TQ - tq_w - 1) * ALIGN - 512, C)          # flat table offsets
bsz = np.full(C, blk_pad - 101, np.float64)
alpha = rng.random(C)
remc0 = rng.random(C)
inc = rng.random(C) * 0.01

q = soff // ALIGN
r = soff - q * ALIGN
qt = o_tab // ALIGN
rt = o_tab - qt * ALIGN
shi = (inc * 128.0) % 1.0
slo = inc % 1.0
remc = (remc0 - inc * r) % 1.0

f32 = lambda x: jnp.asarray(x, jnp.float32)
i32 = lambda x: jnp.asarray(x, jnp.int32)
out = np.asarray(correlate_bank_hbm(
    i32(q), i32(np.arange(C)), i32(qt), i32(rt),
    f32(alpha), f32(remc), f32(shi), f32(slo), f32(bsz), f32(r),
    jnp.asarray(rec_i.reshape(NR, 4, 128)),
    jnp.asarray(rec_q.reshape(NR, 4, 128)),
    jnp.asarray(tab.reshape(C, TQ, 4, 128)),
    k=k, blk_pad=blk_pad, interpret=bool(int(__import__('os').environ.get('INTERP','0')))))

# numpy oracle: sum_n (si+j sq)[soff+n] e^{-j2pi(remc0+inc n)} w[o+n+d]
fails = 0
for c in range(C):
    n = np.arange(int(bsz[c]))
    ph = 2 * np.pi * ((remc0[c] + inc[c] * n) % 1.0)
    cosw, sinw = np.cos(ph), np.sin(ph)
    si = rec_i[soff[c] + n].astype(np.float64)
    sq = rec_q[soff[c] + n].astype(np.float64)
    bi = si * cosw + sq * sinw
    bq = sq * cosw - si * sinw
    w = tab[c].astype(np.float64)
    for t, d in enumerate((0, k, 2 * k)):
        # kernel replica frame is BUFFER-relative: flat table index
        # o_tab + m with m = n + r (the engine passes o = start - r)
        a = w[o_tab[c] + r[c] + n + d]
        b = w[o_tab[c] + r[c] + n + d + 1]
        wt = a + alpha[c] * (b - a)
        ie, qe = (wt * bi).sum(), (wt * bq).sum()
        gi, gq = out[c, 2 * t], out[c, 2 * t + 1]
        scale = max(abs(ie), abs(qe), 1.0)
        if abs(gi - ie) / scale > 2e-3 or abs(gq - qe) / scale > 2e-3:
            fails += 1
            print(f"ch{c} tap{t}: got ({gi:.1f},{gq:.1f}) "
                  f"want ({ie:.1f},{qe:.1f})")
print("oracle check:", "OK" if fails == 0 else f"{fails} FAILS")
