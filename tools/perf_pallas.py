#!/usr/bin/env python
"""Prototype: fused Pallas epoch-correlator kernel vs the XLA epoch body.

Division of labor: XLA performs the per-channel dynamic window slices
(native + cheap); the Pallas kernel fuses everything per-sample —
int8→f32, carrier synthesis (split-index phase ramp), sub-sample replica
interpolation (static slices), mask, and the six correlator reductions —
into ONE kernel, eliminating ~10 intermediate HBM materializations per
epoch.
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cusdr_tpu import get_config
from cusdr_tpu.signals.defs import get_signal
from cusdr_tpu.tracking.engine import (build_replica_tables,
                                       init_channel_state,
                                       make_track_params, track_superblock)

TWO_PI = np.float32(2.0 * np.pi)


def make_correlate_kernel(blk_pad: int, k: int):
    """pallas_call: scalars [C,1] f32, windows [C, blk_pad] i8 ×2,
    table window [C, wlen] i8 → [C, 8] f32 sums."""

    def kernel(alpha_r, remc_r, shi_r, slo_r, bsz_r,
               si_r, sq_r, wt_r, out_r):
        C = si_r.shape[0]
        si = si_r[:].astype(jnp.float32)
        sq = sq_r[:].astype(jnp.float32)
        n_f = jax.lax.broadcasted_iota(jnp.int32, (1, blk_pad),
                                       1).astype(jnp.float32)
        n_hi = jnp.floor(n_f * jnp.float32(1.0 / 256.0))
        n_lo = n_f - jnp.float32(256.0) * n_hi
        cyc = remc_r[:] + shi_r[:] * n_hi + slo_r[:] * n_lo
        ph = (cyc - jnp.floor(cyc)) * TWO_PI
        cosw = jnp.cos(ph)
        sinw = jnp.sin(ph)
        mask = (n_f < bsz_r[:]).astype(jnp.float32)
        bb_i = (si * cosw + sq * sinw) * mask
        bb_q = (sq * cosw - si * sinw) * mask

        alpha = alpha_r[:]

        def repl(d):
            a = wt_r[:, d:d + blk_pad].astype(jnp.float32)
            b = wt_r[:, d + 1:d + 1 + blk_pad].astype(jnp.float32)
            return a + alpha * (b - a)

        early = repl(0)
        prompt = repl(k)
        late = repl(2 * k)
        z = jnp.zeros((C, 1), jnp.float32)
        out_r[:] = jnp.concatenate([
            jnp.sum(early * bb_i, axis=1, keepdims=True),
            jnp.sum(early * bb_q, axis=1, keepdims=True),
            jnp.sum(prompt * bb_i, axis=1, keepdims=True),
            jnp.sum(prompt * bb_q, axis=1, keepdims=True),
            jnp.sum(late * bb_i, axis=1, keepdims=True),
            jnp.sum(late * bb_q, axis=1, keepdims=True),
            z, z], axis=1)

    CB = 8   # channels per grid step (VMEM-sized; Mosaic pipelines DMA)

    def call(alpha, remc, shi, slo, bsz, si, sq, wt):
        C = si.shape[0]
        assert C % CB == 0, C
        wlen = wt.shape[1]
        sc = lambda: pl.BlockSpec((CB, 1), lambda i: (i, i * 0),
                                  memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel,
            grid=(C // CB,),
            out_shape=jax.ShapeDtypeStruct((C, 8), jnp.float32),
            in_specs=[sc(), sc(), sc(), sc(), sc(),
                      pl.BlockSpec((CB, si.shape[1]), lambda i: (i, i * 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((CB, si.shape[1]), lambda i: (i, i * 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((CB, wlen), lambda i: (i, i * 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((CB, 8), lambda i: (i, i * 0),
                                   memory_space=pltpu.VMEM),
        )(alpha, remc, shi, slo, bsz, si, sq, wt)

    return call


def main():
    cfg = get_config("gps_l1ca")
    sig = get_signal("gps_l1ca")
    spc = cfg.samples_per_code
    params = make_track_params(cfg, sig)
    p = params
    blk_pad = ((p.blk + 127) // 128) * 128
    k = p.k_spacing
    wlen = ((blk_pad + 2 * k + 1 + 127) // 128) * 128
    C = int(__import__('os').environ.get('PERF_C', 12))
    rng = np.random.default_rng(0)
    n_epochs = 500
    S = (n_epochs + 6) * spc
    sig_i = rng.integers(-16, 16, S).astype(np.int8)
    sig_q = rng.integers(-16, 16, S).astype(np.int8)

    channels = [(1 + (kk % 32), cfg.if_freq + 500.0 * ((kk % 12) - 6),
                 kk * 149) for kk in range(C)]
    dops = [c[1] - cfg.if_freq for c in channels]
    ct, pt = build_replica_tables(cfg, sig, params, channels, dops)
    W = ((ct.shape[1] + 127) // 128) * 128 + wlen
    tab = np.zeros((C, W), np.int8)
    tab[:, :ct.shape[1]] = ct

    kern = make_correlate_kernel(blk_pad, k)

    off = np.asarray([c[2] for c in channels], np.int32)
    shift = np.full(C, p.up_margin - k, np.int32)
    alpha = np.full((C, 1), 0.3, np.float32)
    remc = np.full((C, 1), 0.1, np.float32)
    shi = np.asarray([[(256.0 * (cfg.if_freq + 500.0 * (kk - 6))
                        / cfg.sampling_freq) % 1.0]
                      for kk in range(C)], np.float32)
    slo = np.asarray([[((cfg.if_freq + 500.0 * (kk - 6))
                        / cfg.sampling_freq) % 1.0]
                      for kk in range(C)], np.float32)
    bsz = np.full((C, 1), spc, np.float32)

    sig_i_d = jnp.asarray(sig_i)
    sig_q_d = jnp.asarray(sig_q)
    tab_d = jnp.asarray(tab)

    def slice_windows(off_c, shift_c):
        si = jax.vmap(lambda o: jax.lax.dynamic_slice(
            sig_i_d, (o,), (blk_pad,)))(off_c)
        sq = jax.vmap(lambda o: jax.lax.dynamic_slice(
            sig_q_d, (o,), (blk_pad,)))(off_c)
        wt = jax.vmap(lambda t, s: jax.lax.dynamic_slice(
            t, (s,), (wlen,)))(tab_d, shift_c)
        return si, sq, wt

    @jax.jit
    def one_epoch(off_c, shift_c, alpha, remc, shi, slo, bsz):
        si, sq, wt = slice_windows(off_c, shift_c)
        return kern(alpha, remc, shi, slo, bsz, si, sq, wt)

    args = (jnp.asarray(off), jnp.asarray(shift), jnp.asarray(alpha),
            jnp.asarray(remc), jnp.asarray(shi), jnp.asarray(slo),
            jnp.asarray(bsz))
    out = np.asarray(one_epoch(*args))
    print("kernel output sample:", out[0, :6])

    # numpy reference, channel 0
    c0 = 0
    nhi = (np.arange(blk_pad) // 256).astype(np.float32)
    nlo = (np.arange(blk_pad) % 256).astype(np.float32)
    nidx = np.arange(blk_pad, dtype=np.float32)
    w_i = sig_i[off[c0]:off[c0] + blk_pad].astype(np.float32)
    w_q = sig_q[off[c0]:off[c0] + blk_pad].astype(np.float32)
    cyc = remc[c0, 0] + shi[c0, 0] * nhi + slo[c0, 0] * nlo
    ph = (cyc - np.floor(cyc)).astype(np.float32) * 2 * np.pi
    cw, sw = np.cos(ph), np.sin(ph)
    mask = (nidx < bsz[c0, 0]).astype(np.float32)
    bb_i = (w_i * cw + w_q * sw) * mask
    bb_q = (w_q * cw - w_i * sw) * mask
    s0 = shift[c0]
    a = tab[c0, s0 + k:s0 + k + blk_pad].astype(np.float32)
    b = tab[c0, s0 + k + 1:s0 + k + 1 + blk_pad].astype(np.float32)
    pr = a + alpha[c0, 0] * (b - a)
    ref = np.sum(pr * bb_i)
    print("numpy prompt I:", ref, " rel err:",
          abs(ref - out[0, 2]) / (abs(ref) + 1))

    # ---- timing: 500-epoch scan with minimal feedback -------------------
    @jax.jit
    def scan_kernel(off0, shift0, alpha, remc, shi, slo, bsz):
        def step(carry, _):
            off_c, acc = carry
            si, sq, wt = slice_windows(off_c, shift0)
            o = kern(alpha, remc, shi, slo, bsz, si, sq, wt)
            return (off_c + spc, acc + o[:, 2]), ()

        (_, acc), _ = jax.lax.scan(step, (off0, jnp.zeros(C)), None,
                                   length=n_epochs)
        return acc

    np.asarray(scan_kernel(*args))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(scan_kernel(*args))
        ts.append(time.perf_counter() - t0)
    t = min(ts)
    print(f"pallas scan {n_epochs} epochs: {t*1e3:.1f} ms  "
          f"{n_epochs*spc/t/1e6:.1f} Msps  per-step {t/n_epochs*1e6:.1f} us")


if __name__ == "__main__":
    main()


def make_table_carrier_kernel(blk_pad: int, k: int):
    """Variant: carrier via per-channel basis tables T_c/T_s = cos/sin of
    the fixed-frequency ramp, rotated per epoch by scalar (cosφ0, sinφ0)
    (angle addition) — removes the in-kernel cos/sin transcendentals."""

    def kernel(alpha_r, c0_r, s0_r, bsz_r, si_r, sq_r, tc_r, ts_r,
               wt_r, out_r):
        cb = si_r.shape[0]
        si = si_r[:].astype(jnp.float32)
        sq = sq_r[:].astype(jnp.float32)
        n_f = jax.lax.broadcasted_iota(jnp.int32, (1, blk_pad),
                                       1).astype(jnp.float32)
        cosw = c0_r[:] * tc_r[:] - s0_r[:] * ts_r[:]
        sinw = s0_r[:] * tc_r[:] + c0_r[:] * ts_r[:]
        mask = (n_f < bsz_r[:]).astype(jnp.float32)
        bb_i = (si * cosw + sq * sinw) * mask
        bb_q = (sq * cosw - si * sinw) * mask
        alpha = alpha_r[:]

        def repl(d):
            a = wt_r[:, d:d + blk_pad].astype(jnp.float32)
            b = wt_r[:, d + 1:d + 1 + blk_pad].astype(jnp.float32)
            return a + alpha * (b - a)

        early, prompt, late = repl(0), repl(k), repl(2 * k)
        z = jnp.zeros((cb, 1), jnp.float32)
        out_r[:] = jnp.concatenate([
            jnp.sum(early * bb_i, axis=1, keepdims=True),
            jnp.sum(early * bb_q, axis=1, keepdims=True),
            jnp.sum(prompt * bb_i, axis=1, keepdims=True),
            jnp.sum(prompt * bb_q, axis=1, keepdims=True),
            jnp.sum(late * bb_i, axis=1, keepdims=True),
            jnp.sum(late * bb_q, axis=1, keepdims=True), z, z], axis=1)

    CB = 8

    def call(alpha, c0, s0, bsz, si, sq, tc, ts, wt):
        C = si.shape[0]
        wlen = wt.shape[1]
        sc = lambda: pl.BlockSpec((CB, 1), lambda i: (i, i * 0),
                                  memory_space=pltpu.VMEM)
        mt = lambda w: pl.BlockSpec((CB, w), lambda i: (i, i * 0),
                                    memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel, grid=(C // CB,),
            out_shape=jax.ShapeDtypeStruct((C, 8), jnp.float32),
            in_specs=[sc(), sc(), sc(), sc(), mt(blk_pad), mt(blk_pad),
                      mt(blk_pad), mt(blk_pad), mt(wlen)],
            out_specs=pl.BlockSpec((CB, 8), lambda i: (i, i * 0),
                                   memory_space=pltpu.VMEM))(
            alpha, c0, s0, bsz, si, sq, tc, ts, wt)

    return call


def bench_table_carrier():
    import os
    cfg = get_config("gps_l1ca")
    sig = get_signal("gps_l1ca")
    spc = cfg.samples_per_code
    params = make_track_params(cfg, sig)
    p = params
    blk_pad = ((p.blk + 127) // 128) * 128
    k = p.k_spacing
    wlen = ((blk_pad + 2 * k + 1 + 127) // 128) * 128
    C = int(os.environ.get('PERF_C', 96))
    rng = np.random.default_rng(0)
    n_epochs = 500
    S = (n_epochs + 6) * spc
    sig_i = jnp.asarray(rng.integers(-16, 16, S).astype(np.int8))
    sig_q = jnp.asarray(rng.integers(-16, 16, S).astype(np.int8))
    tab = jnp.asarray(rng.integers(-1, 2, (C, wlen + 512)).astype(np.int8))
    freqs = cfg.if_freq + 500.0 * (np.arange(C) % 12 - 6)
    nn = np.arange(blk_pad)
    tc = jnp.asarray(np.stack([np.cos(2*np.pi*f/cfg.sampling_freq*nn)
                               for f in freqs]).astype(np.float32))
    ts = jnp.asarray(np.stack([np.sin(2*np.pi*f/cfg.sampling_freq*nn)
                               for f in freqs]).astype(np.float32))
    kern = make_table_carrier_kernel(blk_pad, k)
    off0 = jnp.asarray((np.arange(C) * 149).astype(np.int32))
    shift0 = jnp.asarray(np.full(C, 64, np.int32))
    col = np.full((C, 1), 0.3, np.float32)
    alpha, c0, s0 = (jnp.asarray(col),)*3
    bsz = jnp.asarray(np.full((C, 1), spc, np.float32))

    @jax.jit
    def scan_kernel(off0, shift0):
        def step(carry, _):
            off_c, acc = carry
            si = jax.vmap(lambda o: jax.lax.dynamic_slice(
                sig_i, (o,), (blk_pad,)))(off_c)
            sq = jax.vmap(lambda o: jax.lax.dynamic_slice(
                sig_q, (o,), (blk_pad,)))(off_c)
            wt = jax.vmap(lambda t, s: jax.lax.dynamic_slice(
                t, (s,), (wlen,)))(tab, shift0)
            o = kern(alpha, c0, s0, bsz, si, sq, tc, ts, wt)
            return (off_c + spc, acc + o[:, 2]), ()
        (_, acc), _ = jax.lax.scan(step, (off0, jnp.zeros(C)), None,
                                   length=n_epochs)
        return acc

    import time as _t
    np.asarray(scan_kernel(off0, shift0))
    ts_ = []
    for _ in range(3):
        t0 = _t.perf_counter()
        np.asarray(scan_kernel(off0, shift0))
        ts_.append(_t.perf_counter() - t0)
    t = min(ts_)
    print(f"table-carrier C={C}: {t*1e3:.1f} ms  per-step "
          f"{t/n_epochs*1e6:.1f} us  "
          f"{t/n_epochs/(C*blk_pad)*1e9:.3f} ns/cs")


if __name__ == "__main__" and __import__('os').environ.get('PERF_TABLE'):
    bench_table_carrier()
