#!/usr/bin/env python
"""Microbenchmarks of tracking-epoch component costs on the TPU.

The tunneled backend has a ~24 ms host round-trip per call, so each
variant runs ITERS times inside one jitted lax.scan and the cost is the
slope between two iteration counts.
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

C, S = 2400, 18048
N_CS = C * S
ITERS_LO, ITERS_HI = 4, 20


def slope(make_fn, *args):
    f_lo = make_fn(ITERS_LO)
    f_hi = make_fn(ITERS_HI)
    for f in (f_lo, f_hi):
        np.asarray(f(*args))
    t = {}
    for key, f in (("lo", f_lo), ("hi", f_hi)):
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(f(*args))
            best = min(best, time.perf_counter() - t0)
        t[key] = best
    per_iter = (t["hi"] - t["lo"]) / (ITERS_HI - ITERS_LO)
    return per_iter


def report(name, per_iter):
    print(f"{name:22s} {per_iter*1e3:8.2f} ms/iter "
          f"{per_iter/N_CS*1e9:7.3f} ns/cs")


def main():
    print("device:", jax.devices()[0])
    rng = np.random.default_rng(0)
    si = jnp.asarray(rng.integers(-16, 16, (C, S)).astype(np.int8))
    sq = jnp.asarray(rng.integers(-16, 16, (C, S)).astype(np.int8))
    wt = jnp.asarray(rng.integers(-1, 2, (C, S)).astype(np.int8))
    ph0 = jnp.asarray(rng.random((C, 1)).astype(np.float32))
    stp = jnp.asarray((rng.random((C, 1)) * 0.3).astype(np.float32))
    bi0 = jnp.asarray(rng.standard_normal((C, S)).astype(np.float32))

    def scan_of(body, iters):
        @jax.jit
        def run(*args):
            def step(carry, _):
                return carry + 1e-6, body(carry, *args)
            c, ys = jax.lax.scan(step, jnp.float32(0.0), None,
                                 length=iters)
            return jax.tree.map(lambda y: y[-1], ys)
        return run

    # 1. full epoch math
    def epoch(carry, si, sq, wt, ph0, stp):
        n = jnp.arange(S, dtype=jnp.float32)[None, :]
        cyc = (ph0 + carry) + stp * n
        ph = (cyc - jnp.floor(cyc)) * jnp.float32(2 * np.pi)
        c, s = jnp.cos(ph), jnp.sin(ph)
        fi, fq = si.astype(jnp.float32), sq.astype(jnp.float32)
        bi = fi * c + fq * s
        bq = fq * c - fi * s
        w = wt.astype(jnp.float32)
        out = []
        for d in (0, 1, 2):
            wd = jnp.roll(w, d, axis=1)
            out += [jnp.sum(wd * bi, axis=1), jnp.sum(wd * bq, axis=1)]
        return jnp.stack(out)

    report("epoch math", slope(
        lambda it: scan_of(epoch, it), si, sq, wt, ph0, stp))

    # 2. no transcendentals
    def epoch_notrig(carry, si, sq, wt, ph0, stp):
        n = jnp.arange(S, dtype=jnp.float32)[None, :]
        c = (ph0 + carry) + stp * n
        s = ph0 - stp * n
        fi, fq = si.astype(jnp.float32), sq.astype(jnp.float32)
        bi = fi * c + fq * s
        bq = fq * c - fi * s
        w = wt.astype(jnp.float32)
        out = []
        for d in (0, 1, 2):
            wd = jnp.roll(w, d, axis=1)
            out += [jnp.sum(wd * bi, axis=1), jnp.sum(wd * bq, axis=1)]
        return jnp.stack(out)

    report("epoch no-trig", slope(
        lambda it: scan_of(epoch_notrig, it), si, sq, wt, ph0, stp))

    # 3. sin+cos alone
    def trig(carry, ph0, stp):
        n = jnp.arange(S, dtype=jnp.float32)[None, :]
        cyc = (ph0 + carry) + stp * n
        ph = (cyc - jnp.floor(cyc)) * jnp.float32(2 * np.pi)
        return jnp.sum(jnp.cos(ph) + jnp.sin(ph), axis=1)

    report("sin+cos ramp", slope(lambda it: scan_of(trig, it), ph0, stp))

    # 4. reduce floor
    def red(carry, bi0):
        return jnp.sum(bi0 + carry, axis=1)

    report("reduce floor", slope(lambda it: scan_of(red, it), bi0))

    # 5. int8 loads + convert + 6 MACs (the pure correlator core)
    def corr6(carry, si, sq, wt):
        fi = si.astype(jnp.float32) + carry
        fq = sq.astype(jnp.float32)
        w = wt.astype(jnp.float32)
        out = []
        for d in (0, 1, 2):
            wd = jnp.roll(w, d, axis=1)
            out += [jnp.sum(wd * fi, axis=1), jnp.sum(wd * fq, axis=1)]
        return jnp.stack(out)

    report("corr6 int8", slope(lambda it: scan_of(corr6, it), si, sq, wt))

    # 6. window slices (per-channel gathers) for one epoch's windows
    sb = jnp.asarray(rng.integers(-16, 16, 40_000_000).astype(np.int8))
    offs = jnp.asarray(rng.integers(0, 20_000_000, C).astype(np.int32))

    def slices(carry, sb, offs):
        o2 = offs + carry.astype(jnp.int32)
        w = jax.vmap(lambda o: jax.lax.dynamic_slice(sb, (o,), (S,)))(o2)
        return w.astype(jnp.float32).sum(axis=1)

    report("window slices", slope(lambda it: scan_of(slices, it),
                                  sb, offs))

    # 7. bf16 matmul-shaped correlator: [C*141, 128] @ [128, 8]
    L, nch = 128, S // L
    wtaps = jnp.asarray(rng.integers(-1, 2, (L, 8)).astype(np.float32)
                        ).astype(jnp.bfloat16)

    def mxu(carry, bi0, wtaps):
        x = (bi0 + carry).astype(jnp.bfloat16).reshape(C * nch, L)
        y = x @ wtaps
        return y.astype(jnp.float32).reshape(C, nch, 8).sum(axis=1)

    report("bf16 mm [.,128]@[128,8]",
           slope(lambda it: scan_of(mxu, it), bi0, wtaps))


if __name__ == "__main__":
    main()
