#!/usr/bin/env python
"""Tracking-engine perf experiments (run on the real TPU).

Times isolated variants of the per-epoch tracking step to locate the
bottleneck: (A) engine as-is, (B) deinterleave hoisted out of the scan,
(C) f32 scalar carry (numerically unacceptable, timing probe only),
(D) scan unroll, (E) larger time-parallel block counts.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from cusdr_tpu import get_config
from cusdr_tpu.signals.defs import get_signal
from cusdr_tpu.tracking.engine import (build_replica_tables,
                                       init_channel_state,
                                       make_track_params, track_superblock)

N_EPOCHS = 1000  # divisible by 8/20/40/100


def timeit(fn, *args, n=3):
    fn(*args)                      # compile
    best = np.inf
    for _ in range(n):
        t0 = time.perf_counter()
        r = fn(*args)
        jax.tree.map(lambda x: np.asarray(x) if hasattr(x, "shape")
                     else x, r)
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    cfg = get_config("gps_l1ca")
    sig = get_signal("gps_l1ca")
    spc = cfg.samples_per_code
    params = make_track_params(cfg, sig)
    rng = np.random.default_rng(0)
    n_channels = cfg.num_channels
    n_samples = (N_EPOCHS + 4) * spc
    samples = rng.integers(-16, 16, 2 * n_samples).astype(np.int8)
    channels = [(1 + k, cfg.if_freq + 500.0 * (k - 6), k * 1499)
                for k in range(n_channels)]
    dops = [c[1] - cfg.if_freq for c in channels]
    ctabs, ptabs = build_replica_tables(cfg, sig, params, channels, dops)
    ctabs = jnp.asarray(ctabs)
    ptabs = jnp.asarray(ptabs)
    state = init_channel_state(channels, sig.chip_rate_hz,
                               dopplers=dops,
                               carrier_freq_hz=sig.carrier_freq_hz)
    samples_d = jnp.asarray(samples)

    def run_A(samples_d, state):
        st, outs = track_superblock(samples_d, jnp.int64(0), ctabs, ptabs,
                                    state, params, N_EPOCHS)
        return st.carr_freq

    tA = timeit(run_A, samples_d, state)
    rate = N_EPOCHS * spc / tA
    print(f"A engine-as-is:      {tA*1e3:8.1f} ms  {rate/1e6:7.1f} Msps")

    # ---- B: deinterleave hoisted --------------------------------------
    from cusdr_tpu.tracking import engine as E
    import functools

    def epoch_hoisted(sig_i_all, sig_q_all, sb_start, code_table,
                      pilot_table, st, p):
        # identical to _epoch_one_channel but slices pre-split planes
        _TWO_PI = 2.0 * np.pi
        code_phase_step = st.code_freq / p.fs
        blksize = jnp.ceil((p.code_len - st.rem_code_phase)
                           / code_phase_step).astype(jnp.int32)
        blksize = jnp.minimum(blksize, p.blk)
        off = st.abs_sample - sb_start
        sig_i = jax.lax.dynamic_slice(sig_i_all, (off,),
                                      (p.blk,)).astype(jnp.float32)
        sig_q = jax.lax.dynamic_slice(sig_q_all, (off,),
                                      (p.blk,)).astype(jnp.float32)
        n = jnp.arange(p.blk, dtype=jnp.float32)
        mask = n < blksize.astype(jnp.float32)
        shift_f = st.rem_code_phase / code_phase_step
        shift = jnp.floor(shift_f).astype(jnp.int32)
        alpha = (shift_f - jnp.floor(shift_f)).astype(jnp.float32)
        k = jnp.round(p.spacing / code_phase_step).astype(jnp.int32)
        start = p.up_margin + shift

        def repl(delta):
            a = jax.lax.dynamic_slice(code_table, (start + delta,),
                                      (p.blk,))
            b = jax.lax.dynamic_slice(code_table, (start + delta + 1,),
                                      (p.blk,))
            return a + alpha * (b - a)

        early, prompt, late = repl(-k), repl(0), repl(k)
        inc = _TWO_PI * st.carr_freq / p.fs
        inc_c = st.carr_freq / p.fs
        step_hi = jnp.mod(inc_c * 256.0, 1.0).astype(jnp.float32)
        step_lo = jnp.mod(inc_c, 1.0).astype(jnp.float32)
        rem_c = jnp.mod(st.rem_carr_phase / _TWO_PI, 1.0).astype(
            jnp.float32)
        n_i = jnp.arange(p.blk, dtype=jnp.int32)
        n_hi = (n_i // 256).astype(jnp.float32)
        n_lo = (n_i % 256).astype(jnp.float32)
        cyc = rem_c + step_hi * n_hi + step_lo * n_lo
        phase = (cyc - jnp.floor(cyc)) * jnp.float32(_TWO_PI)
        cosw, sinw = jnp.cos(phase), jnp.sin(phase)
        bb_i = (sig_i * cosw + sig_q * sinw) * mask
        bb_q = (sig_q * cosw - sig_i * sinw) * mask
        codes = jnp.stack([early, prompt, late])
        bb = jnp.stack([bb_i, bb_q], axis=1)
        sums = jnp.dot(codes, bb, preferred_element_type=jnp.float32)
        i_e, q_e = sums[0, 0], sums[0, 1]
        i_p, q_p = sums[1, 0], sums[1, 1]
        i_l, q_l = sums[2, 0], sums[2, 1]
        bsf = blksize.astype(jnp.float64)
        rem_code = (st.rem_code_phase + bsf * code_phase_step) - p.code_len
        rem_carr = jnp.mod(st.rem_carr_phase + inc * bsf, _TWO_PI)
        eps = jnp.float32(1e-12)
        carr_err = (jnp.arctan(q_p / (i_p + eps))
                    / _TWO_PI).astype(jnp.float64)
        carr_nco = (st.carr_nco + (p.tau2_carr / p.tau1_carr)
                    * (carr_err - st.carr_err)
                    + carr_err * (p.pdi / p.tau1_carr))
        carr_freq = st.carr_freq_basis + carr_nco
        env_e = jnp.sqrt(i_e * i_e + q_e * q_e)
        env_l = jnp.sqrt(i_l * i_l + q_l * q_l)
        code_err = ((env_e - env_l)
                    / (env_e + env_l + eps)).astype(jnp.float64)
        code_nco = (st.code_nco + (p.tau2_code / p.tau1_code)
                    * (code_err - st.code_err)
                    + code_err * (p.pdi / p.tau1_code))
        code_freq = st.code_freq_basis - code_nco
        new_state = E.ChannelState(
            carr_freq=carr_freq, carr_freq_basis=st.carr_freq_basis,
            code_freq=code_freq, code_freq_basis=st.code_freq_basis,
            rem_code_phase=rem_code, rem_carr_phase=rem_carr,
            carr_nco=carr_nco, carr_err=carr_err,
            code_nco=code_nco, code_err=code_err,
            d_carr=st.d_carr, d2_carr=st.d2_carr,
            abs_sample=st.abs_sample + blksize.astype(jnp.int64))
        return new_state, (i_p, q_p)

    @functools.partial(jax.jit, static_argnames=("n_epochs", "unroll"))
    def track_hoisted(samples_iq, state, n_epochs, unroll=1):
        sig_i_all = samples_iq[0::2]
        sig_q_all = samples_iq[1::2]
        vm = jax.vmap(epoch_hoisted,
                      in_axes=(None, None, None, 0, 0, 0, None))

        def step(st, _):
            return vm(sig_i_all, sig_q_all, jnp.int64(0), ctabs, ptabs,
                      st, params)

        return jax.lax.scan(step, state, None, length=n_epochs,
                            unroll=unroll)

    def run_B(samples_d, state):
        st, outs = track_hoisted(samples_d, state, N_EPOCHS)
        return st.carr_freq

    tB = timeit(run_B, samples_d, state)
    print(f"B hoisted-deint:     {tB*1e3:8.1f} ms  "
          f"{N_EPOCHS*spc/tB/1e6:7.1f} Msps")

    for unroll in (2, 4, 8):
        def run_U(samples_d, state, u=unroll):
            st, outs = track_hoisted(samples_d, state, N_EPOCHS, u)
            return st.carr_freq
        tU = timeit(run_U, samples_d, state)
        print(f"B + unroll {unroll}:       {tU*1e3:8.1f} ms  "
              f"{N_EPOCHS*spc/tU/1e6:7.1f} Msps")

    # ---- E: time-parallel with more blocks ----------------------------
    from cusdr_tpu.parallel.timeblocks import _track_blocks
    for n_blocks in (8, 20, 40, 100):
        if N_EPOCHS % n_blocks:
            continue
        epb = N_EPOCHS // n_blocks
        blk_len = (epb + 4) * spc
        sbs = np.stack([samples[2 * b * epb * spc:
                                2 * (b * epb * spc + blk_len)]
                        for b in range(n_blocks)])
        starts = jnp.asarray(
            np.arange(n_blocks, dtype=np.int64) * epb * spc)
        st_b = jax.tree.map(lambda x: jnp.stack([x] * n_blocks), state)
        sbs_d = jnp.asarray(sbs)

        def run_TP(sbs_d, starts, st_b, epb=epb):
            st, outs = _track_blocks(sbs_d, starts, ctabs, ptabs, st_b,
                                     params, epb)
            return st.carr_freq

        tTP = timeit(run_TP, sbs_d, starts, st_b)
        print(f"E time-par B={n_blocks:3d}:    {tTP*1e3:8.1f} ms  "
              f"{N_EPOCHS*spc/tTP/1e6:7.1f} Msps")


if __name__ == "__main__":
    main()


def probe_f32_carry():
    """Timing probe only: identical structure with an all-f32 scalar carry
    (numerically unacceptable for production — measures the cost of f64
    emulation on v5e)."""
    import functools
    cfg = get_config("gps_l1ca")
    sig = get_signal("gps_l1ca")
    spc = cfg.samples_per_code
    params = make_track_params(cfg, sig)
    rng = np.random.default_rng(0)
    n_channels = cfg.num_channels
    n_samples = (N_EPOCHS + 4) * spc
    samples = rng.integers(-16, 16, 2 * n_samples).astype(np.int8)
    channels = [(1 + k, cfg.if_freq + 500.0 * (k - 6), k * 1499)
                for k in range(n_channels)]
    dops = [c[1] - cfg.if_freq for c in channels]
    ctabs_np, ptabs_np = build_replica_tables(cfg, sig, params, channels,
                                              dops)
    ctabs = jnp.asarray(ctabs_np)
    samples_d = jnp.asarray(samples)
    p = params

    carr0 = jnp.asarray([c[1] for c in channels], jnp.float32)
    code0 = jnp.full(n_channels, sig.chip_rate_hz, jnp.float32)
    z = jnp.zeros(n_channels, jnp.float32)
    abss = jnp.asarray([c[2] for c in channels], jnp.int32)
    st0 = (carr0, code0, z, z, z, z, z, z, abss, carr0, code0)

    def epoch32(samples_iq, ct, st):
        (carr_freq, code_freq, rem_code, rem_carr, carr_nco, carr_err,
         code_nco, code_err, abs_sample, carr_basis, code_basis) = st
        step = code_freq / np.float32(p.fs)
        blksize = jnp.ceil((np.float32(p.code_len) - rem_code)
                           / step).astype(jnp.int32)
        blksize = jnp.minimum(blksize, p.blk)
        off = 2 * abs_sample
        raw = jax.lax.dynamic_slice(samples_iq, (off,), (2 * p.blk,))
        sig_i = raw[0::2].astype(jnp.float32)
        sig_q = raw[1::2].astype(jnp.float32)
        n = jnp.arange(p.blk, dtype=jnp.float32)
        mask = n < blksize.astype(jnp.float32)
        shift_f = rem_code / step
        shift = jnp.floor(shift_f).astype(jnp.int32)
        alpha = shift_f - jnp.floor(shift_f)
        k = jnp.round(np.float32(p.spacing) / step).astype(jnp.int32)
        start = p.up_margin + shift

        def repl(delta):
            a = jax.lax.dynamic_slice(ct, (start + delta,), (p.blk,))
            b = jax.lax.dynamic_slice(ct, (start + delta + 1,), (p.blk,))
            return a + alpha * (b - a)

        early, prompt, late = repl(-k), repl(0), repl(k)
        inc_c = carr_freq / np.float32(p.fs)
        step_hi = jnp.mod(inc_c * 256.0, 1.0)
        step_lo = jnp.mod(inc_c, 1.0)
        rem_c = jnp.mod(rem_carr, 1.0)
        n_i = jnp.arange(p.blk, dtype=jnp.int32)
        n_hi = (n_i // 256).astype(jnp.float32)
        n_lo = (n_i % 256).astype(jnp.float32)
        cyc = rem_c + step_hi * n_hi + step_lo * n_lo
        phase = (cyc - jnp.floor(cyc)) * np.float32(2 * np.pi)
        cosw, sinw = jnp.cos(phase), jnp.sin(phase)
        bb_i = (sig_i * cosw + sig_q * sinw) * mask
        bb_q = (sig_q * cosw - sig_i * sinw) * mask
        codes = jnp.stack([early, prompt, late])
        bb = jnp.stack([bb_i, bb_q], axis=1)
        sums = jnp.dot(codes, bb, preferred_element_type=jnp.float32)
        i_e, q_e = sums[0, 0], sums[0, 1]
        i_p, q_p = sums[1, 0], sums[1, 1]
        i_l, q_l = sums[2, 0], sums[2, 1]
        bsf = blksize.astype(jnp.float32)
        rem_code2 = (rem_code + bsf * step) - np.float32(p.code_len)
        rem_carr2 = jnp.mod(rem_carr + inc_c * bsf, 1.0)
        eps = jnp.float32(1e-12)
        ce = jnp.arctan(q_p / (i_p + eps)) / np.float32(2 * np.pi)
        cn = (carr_nco + np.float32(p.tau2_carr / p.tau1_carr)
              * (ce - carr_err) + ce * np.float32(p.pdi / p.tau1_carr))
        cf = carr_basis + cn
        env_e = jnp.sqrt(i_e * i_e + q_e * q_e)
        env_l = jnp.sqrt(i_l * i_l + q_l * q_l)
        de = (env_e - env_l) / (env_e + env_l + eps)
        dn = (code_nco + np.float32(p.tau2_code / p.tau1_code)
              * (de - code_err) + de * np.float32(p.pdi / p.tau1_code))
        df = code_basis - dn
        st2 = (cf, df, rem_code2, rem_carr2, cn, ce, dn, de,
               abs_sample + blksize, carr_basis, code_basis)
        return st2, (i_p, q_p)

    import functools as ft

    @ft.partial(jax.jit, static_argnames=("n_epochs",))
    def track32(samples_iq, st, n_epochs):
        vm = jax.vmap(epoch32, in_axes=(None, 0, (0,) * 11))

        def stepf(st, _):
            return vm(samples_iq, ctabs, st)

        return jax.lax.scan(stepf, st, None, length=n_epochs)

    def run(samples_d, st0):
        st, _ = track32(samples_d, st0, N_EPOCHS)
        return st[0]

    spc_ = spc
    t = timeit(run, samples_d, st0)
    print(f"C f32-carry probe:   {t*1e3:8.1f} ms  "
          f"{N_EPOCHS*spc_/t/1e6:7.1f} Msps")


if __name__ == "__main__" and True:
    probe_f32_carry()
