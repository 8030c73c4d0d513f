"""Fused Pallas TPU epoch-correlator kernel.

One kernel evaluates, for a bank of channels, everything the tracking
epoch does per sample — int8→f32 conversion, factorized-exponential
carrier synthesis, sub-sample replica interpolation (static slices),
edge masking — and reduces to the E/P/L (± pilot) correlator sums.  This
replaces ~10 separate XLA fusions per scan step whose intermediates each
round-trip VMEM/HBM; measured ~0.17 ns per channel-sample on TPU v5e.

Two entry points:

* ``correlate_bank`` — operands pre-staged as [C, blk_pad] VMEM blocks
  (vmappable; used by the sharded time-block path).
* ``correlate_bank_hbm`` — the sample record and replica tables stay in
  HBM; per-channel windows are DMA'd into VMEM scratch inside the kernel
  from scalar-prefetched offsets, double-buffered across the channel
  grid.  This removes the XLA gather/materialization of the windows
  (measured slower than the whole kernel) and all of its HBM round-trip.

Reference semantics: the six correlator sums of
GPS/GPS_L1CA/include/tracking.m:280-300 (carrier wipe-off + dot products)
plus the π/2-rotated pilot correlators of the data+pilot receivers
(GPS_L5C/include/tracking.m:334-345).

Channel-bank layout: all arrays are [C, ...] with C a multiple of 8
(the f32 sublane tile); the kernel grids over 8-channel chunks so VMEM
stays bounded.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TWO_PI = np.float32(2.0 * np.pi)

CHANNEL_BLOCK = 8


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _correlate_block(si, sq, wt, wp, alpha, alpha_p, remc, shi, slo, bsz,
                     *, blk_pad: int, k: int, has_pilot: bool,
                     pilot_rot: int):
    """Shared kernel body: correlator sums for one cb-channel block.

    si/sq: (cb, blk_pad) int8 sample windows; wt/wp: (cb, wlen) int8
    replica windows; scalars (cb, 1) f32.  Returns (cb, n_out) f32.
    """
    cb = si.shape[0]
    si = si.astype(jnp.float32)
    sq = sq.astype(jnp.float32)
    # Factorized carrier synthesis: with n = 128*t + l,
    #   e^{-j2π(remc + inc·n)} = u[t] · v[l],
    #   u[t] = e^{j2π(remc + frac(128·inc)·t)},  v[l] = e^{j2π·frac(inc)·l}
    # so the transcendentals drop from blk_pad evaluations per row to
    # T + 128 (~67x fewer — sin/cos dominated the original kernel),
    # and each sample costs one 6-op complex multiply instead.
    # Phase error stays ~1e-5 cycles: each factor's f32 phase product
    # is bounded by ~141 cycles before the mod-1 reduction.
    T = blk_pad // 128
    t_f = jax.lax.broadcasted_iota(jnp.int32, (1, T), 1).astype(
        jnp.float32)
    l_f = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1).astype(
        jnp.float32)
    pu = remc + shi * t_f                      # (cb, T) cycles
    pu = (pu - jnp.floor(pu)) * _TWO_PI
    pv = slo * l_f                             # (cb, 128) cycles
    pv = (pv - jnp.floor(pv)) * _TWO_PI
    ur = jnp.cos(pu).reshape(cb, T, 1)
    ui = jnp.sin(pu).reshape(cb, T, 1)
    vr = jnp.cos(pv).reshape(cb, 1, 128)
    vi = jnp.sin(pv).reshape(cb, 1, 128)
    cosw = (ur * vr - ui * vi).reshape(cb, blk_pad)
    sinw = (ur * vi + ui * vr).reshape(cb, blk_pad)
    n_f = jax.lax.broadcasted_iota(jnp.int32, (1, blk_pad),
                                   1).astype(jnp.float32)
    mask = (n_f < bsz).astype(jnp.float32)
    bb_i = (si * cosw + sq * sinw) * mask
    bb_q = (sq * cosw - si * sinw) * mask

    def taps(w, al):
        def repl(d):
            a = w[:, d:d + blk_pad].astype(jnp.float32)
            b = w[:, d + 1:d + 1 + blk_pad].astype(jnp.float32)
            return a + al * (b - a)
        return repl(0), repl(k), repl(2 * k)

    early, prompt, late = taps(wt, alpha)

    def s(x):
        return jnp.sum(x, axis=1, keepdims=True)

    cols = [s(early * bb_i), s(early * bb_q),
            s(prompt * bb_i), s(prompt * bb_q),
            s(late * bb_i), s(late * bb_q)]
    z = jnp.zeros((cb, 1), jnp.float32)
    if has_pilot:
        pe, pp, plate = taps(wp, alpha_p)
        # pilot carrier at j^rot vs data: 1 = quadrature
        # (exp(-j(φ-π/2))·s = j·bb), 0 = time-multiplexed (L2C CL,
        # GPS_L2C/include/tracking.m:317-324), 2 = -I (B1C BOC(6,1),
        # WB_tracking.m:364-369), 3 = -Q
        if pilot_rot == 0:
            pb_i, pb_q = bb_i, bb_q
        elif pilot_rot == 1:
            pb_i, pb_q = -bb_q, bb_i
        elif pilot_rot == 2:
            pb_i, pb_q = -bb_i, -bb_q
        else:
            pb_i, pb_q = bb_q, -bb_i
        cols += [s(pe * pb_i), s(pe * pb_q),
                 s(pp * pb_i), s(pp * pb_q),
                 s(plate * pb_i), s(plate * pb_q), z, z, z, z]
    else:
        cols += [z, z]
    return jnp.concatenate(cols, axis=1)


@functools.lru_cache(maxsize=64)
def _build_call(blk_pad: int, wlen: int, k: int, has_pilot: bool,
                pilot_rot: int, interpret: bool):
    n_out = 16 if has_pilot else 8

    def kernel(*refs):
        if has_pilot:
            (alpha_r, alphap_r, remc_r, shi_r, slo_r, bsz_r,
             si_r, sq_r, wt_r, wp_r, out_r) = refs
        else:
            (alpha_r, remc_r, shi_r, slo_r, bsz_r,
             si_r, sq_r, wt_r, out_r) = refs
            alphap_r = wp_r = None
        out_r[:] = _correlate_block(
            si_r[:], sq_r[:], wt_r[:],
            wp_r[:] if has_pilot else None,
            alpha_r[:], alphap_r[:] if has_pilot else None,
            remc_r[:], shi_r[:], slo_r[:], bsz_r[:],
            blk_pad=blk_pad, k=k, has_pilot=has_pilot,
            pilot_rot=pilot_rot)

    cb = CHANNEL_BLOCK

    def vec():
        return pl.BlockSpec((cb, 1), lambda i: (i, i * 0),
                            memory_space=pltpu.VMEM)

    def mat(w):
        return pl.BlockSpec((cb, w), lambda i: (i, i * 0),
                            memory_space=pltpu.VMEM)

    def call(alpha, alpha_p, remc, shi, slo, bsz, si, sq, wt, wp=None):
        c = si.shape[0]
        assert c % cb == 0, c
        if has_pilot:
            in_specs = [vec()] * 6 + [mat(blk_pad), mat(blk_pad),
                                      mat(wlen), mat(wlen)]
            args = [alpha, alpha_p, remc, shi, slo, bsz, si, sq, wt, wp]
        else:
            in_specs = [vec()] * 5 + [mat(blk_pad), mat(blk_pad),
                                      mat(wlen)]
            args = [alpha, remc, shi, slo, bsz, si, sq, wt]
        return pl.pallas_call(
            kernel,
            grid=(c // cb,),
            out_shape=jax.ShapeDtypeStruct((c, n_out), jnp.float32),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((cb, n_out), lambda i: (i, i * 0),
                                   memory_space=pltpu.VMEM),
            interpret=interpret,
        )(*args)

    return call


def correlate_bank(alpha, remc, shi, slo, bsz, si, sq, wt, wp=None,
                   *, k: int, alpha_p=None, pilot_rot: int = 1,
                   interpret: bool = False):
    """Correlator sums for a channel bank (operands pre-staged in VMEM).

    alpha/remc/shi/slo/bsz: [C, 1] f32 per-channel scalars — replica
      interpolation fraction, carrier phase (cycles), 128·step and step
      (cycles/sample, each mod 1 — the factorized-exponential split),
      valid-sample count
    si/sq: [C, blk_pad] int8 sample windows (blk_pad % 128 == 0)
    wt/wp: [C, wlen] int8 replica windows (wlen % 128 == 0, covering
      blk_pad + 2k + 1 from tap -k)
    alpha_p: [C, 1] f32 pilot interpolation fraction (defaults to alpha;
      differs for long pilots whose slice advances per epoch)
    pilot_rot: pilot carrier phase in quarter turns vs data (1 =
      quadrature, 0 = time-multiplexed L2C CL, 2 = -I B1C BOC(6,1))
    Returns [C, 8] (or [C, 16] with pilot) f32:
      iE qE iP qP iL qL [piE pqE piP pqP piL pqL] 0-pad.
    """
    blk_pad = si.shape[1]
    wlen = wt.shape[1]
    call = _build_call(blk_pad, wlen, int(k), wp is not None,
                       int(pilot_rot), bool(interpret))
    if alpha_p is None:
        alpha_p = alpha
    return call(alpha, alpha_p, remc, shi, slo, bsz, si, sq, wt, wp)


@functools.lru_cache(maxsize=64)
def _build_call_hbm(blk_pad: int, wlen: int, k: int, has_pilot: bool,
                    pilot_rot: int, interpret: bool):
    n_out = 16 if has_pilot else 8
    cb = CHANNEL_BLOCK
    n_dma = 4 if has_pilot else 3

    def kernel(*refs):
        if has_pilot:
            (soff_r, woff_r, wrow_r, poff_r,
             alpha_r, alphap_r, remc_r, shi_r, slo_r, bsz_r,
             sig_i_r, sig_q_r, wt_r, wp_r, out_r,
             si_s, sq_s, wt_s, wp_s, sem) = refs
        else:
            (soff_r, woff_r, wrow_r, poff_r,
             alpha_r, remc_r, shi_r, slo_r, bsz_r,
             sig_i_r, sig_q_r, wt_r, out_r,
             si_s, sq_s, wt_s, sem) = refs
            alphap_r = wp_r = wp_s = None
        i = pl.program_id(0)
        n = pl.num_programs(0)

        def dmas(step, slot):
            """The cb-channel window copies for grid step ``step``.

            Every memref index is cast to i32 explicitly: the package
            force-enables x64 (cusdr_tpu/__init__.py), so Python-int /
            weak-typed indices would otherwise lower as i64, which
            Mosaic's memref_slice rejects on hardware."""
            slot = jnp.int32(slot)
            step = jnp.int32(step)
            out = []
            for c in range(cb):
                ci = jnp.int32(c)
                row = step * cb + ci
                so = soff_r[row].astype(jnp.int32)
                out.append(pltpu.make_async_copy(
                    sig_i_r.at[pl.ds(so, blk_pad)],
                    si_s.at[slot, ci], sem.at[slot, jnp.int32(0), ci]))
                out.append(pltpu.make_async_copy(
                    sig_q_r.at[pl.ds(so, blk_pad)],
                    sq_s.at[slot, ci], sem.at[slot, jnp.int32(1), ci]))
                wr = wrow_r[row].astype(jnp.int32)
                wo = woff_r[row].astype(jnp.int32)
                out.append(pltpu.make_async_copy(
                    wt_r.at[wr, pl.ds(wo, wlen)],
                    wt_s.at[slot, ci], sem.at[slot, jnp.int32(2), ci]))
                if has_pilot:
                    po = poff_r[row].astype(jnp.int32)
                    out.append(pltpu.make_async_copy(
                        wp_r.at[wr, pl.ds(po, wlen)],
                        wp_s.at[slot, ci], sem.at[slot, jnp.int32(3), ci]))
            return out

        # double buffering: step i's windows were started at step i-1;
        # start step i+1's now, then wait on i's and compute
        i = jnp.int32(i)
        n = jnp.int32(n)
        slot = jax.lax.rem(i, jnp.int32(2))

        @pl.when(i == 0)
        def _():
            for d in dmas(0, 0):
                d.start()

        @pl.when(i + 1 < n)
        def _():
            for d in dmas(i + 1, jax.lax.rem(i + 1, jnp.int32(2))):
                d.start()

        for d in dmas(i, slot):
            d.wait()

        out_r[:] = _correlate_block(
            si_s[slot], sq_s[slot], wt_s[slot],
            wp_s[slot] if has_pilot else None,
            alpha_r[:], alphap_r[:] if has_pilot else None,
            remc_r[:], shi_r[:], slo_r[:], bsz_r[:],
            blk_pad=blk_pad, k=k, has_pilot=has_pilot,
            pilot_rot=pilot_rot)

    def vec():
        return pl.BlockSpec((cb, 1), lambda i, *_: (i, 0),
                            memory_space=pltpu.VMEM)

    hbm = pl.BlockSpec(memory_space=pltpu.ANY)

    def call(soff, woff, wrow, poff, alpha, alpha_p, remc, shi, slo,
             bsz, sig_i, sig_q, wt, wp=None):
        c = soff.shape[0]
        assert c % cb == 0, c
        n_vec = 6 if has_pilot else 5
        in_specs = [vec()] * n_vec + [hbm] * (4 if has_pilot else 3)
        scratch = [pltpu.VMEM((2, cb, blk_pad), jnp.int8),
                   pltpu.VMEM((2, cb, blk_pad), jnp.int8),
                   pltpu.VMEM((2, cb, wlen), jnp.int8)]
        if has_pilot:
            scratch.append(pltpu.VMEM((2, cb, wlen), jnp.int8))
            args = [alpha, alpha_p, remc, shi, slo, bsz,
                    sig_i, sig_q, wt, wp]
        else:
            args = [alpha, remc, shi, slo, bsz, sig_i, sig_q, wt]
        scratch.append(pltpu.SemaphoreType.DMA((2, n_dma, cb)))
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(c // cb,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((cb, n_out), lambda i, *_: (i, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=scratch,
        )
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((c, n_out), jnp.float32),
            interpret=interpret,
        )(soff, woff, wrow, poff, *args)

    return call


def correlate_bank_hbm(soff, woff, wrow, alpha, remc, shi, slo, bsz,
                       sig_i, sig_q, wt, wp=None, *, k: int,
                       blk_pad: int, wlen: int, poff=None, alpha_p=None,
                       pilot_rot: int = 1, interpret: bool = False):
    """Correlator sums with in-kernel window fetch from HBM.

    soff: [C] i32 sample-window start of each channel in sig_i/sig_q
      (clamped by the caller to [0, len(sig)-blk_pad])
    woff/poff: [C] i32 replica-window starts within the table rows
    wrow: [C] i32 table row per channel (rows may be shared: the flat
      time-parallel path maps B·C channel-rows onto C tables)
    sig_i/sig_q: [S] int8 full sample record (stays in HBM)
    wt/wp: [R, TL] int8 replica tables (stay in HBM)
    Other operands as in correlate_bank.
    """
    call = _build_call_hbm(int(blk_pad), int(wlen), int(k),
                           wp is not None, int(pilot_rot),
                           bool(interpret))
    if alpha_p is None:
        alpha_p = alpha
    if poff is None:
        poff = woff
    return call(soff, woff, wrow, poff, alpha, alpha_p, remc, shi, slo,
                bsz, sig_i, sig_q, wt, wp)
