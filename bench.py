#!/usr/bin/env python
"""Headline benchmark: GPS L1 C/A acquisition + 12-channel tracking
throughput on one TPU chip.

Workload mirrors the reference default (GPS/GPS_L1CA/initSettings.m:44-105):
18 Msps complex IF, 32-PRN x 29-Doppler-bin x 20 ms non-coherent PCPS
acquisition, then 12-channel DLL/PLL tracking.  Metric is IF
samples/sec/chip for the combined pipeline (BASELINE.json), with
vs_baseline = ratio to real-time (18 Msps: a receiver below 1.0 cannot keep
up with its own antenna).

Prints ONE JSON line.
"""

import json
import os
import sys
import time


def _dbg(msg, _t0=[None]):
    if os.environ.get("BENCH_DEBUG"):
        if _t0[0] is None:
            _t0[0] = time.perf_counter()
        print(f"[bench +{time.perf_counter()-_t0[0]:7.1f}s] {msg}",
              file=sys.stderr, flush=True)

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from cusdr_tpu import get_config
    from cusdr_tpu.signals.defs import get_signal, sample_code
    from cusdr_tpu.acquisition.pcps import _pcps_cdma_kernel
    from cusdr_tpu.tracking.engine import (init_channel_state,
                                           make_track_params,
                                           track_superblock)

    cfg = get_config("gps_l1ca")      # 18 Msps, 12 channels, 20 ms noncoh
    sig = get_signal("gps_l1ca")
    spc = cfg.samples_per_code        # 18000
    search_len = 2 * spc
    nfft = 1 << (search_len - 1).bit_length()   # pow2 FFT (65536)
    noncoh = cfg.acq_non_coh_time
    rng = np.random.default_rng(0)

    # ---------------- acquisition workload --------------------------------
    slabs_r = np.zeros((noncoh, nfft), np.float32)
    slabs_i = np.zeros((noncoh, nfft), np.float32)
    slabs_r[:, :search_len] = rng.standard_normal(
        (noncoh, search_len)).astype(np.float32)
    slabs_i[:, :search_len] = rng.standard_normal(
        (noncoh, search_len)).astype(np.float32)
    prns = list(cfg.acq_satellite_list)
    cf_r = np.zeros((len(prns), 1, nfft), np.float32)
    cf_i = np.zeros((len(prns), 1, nfft), np.float32)
    for i, p in enumerate(prns):
        padded = np.zeros(nfft, np.float32)
        padded[:spc] = sample_code(sig.data_code(p), 1, sig.chip_rate_hz,
                                   cfg.sampling_freq, spc)
        cfc = np.conj(np.fft.fft(padded))
        cf_r[i, 0] = cfc.real
        cf_i[i, 0] = cfc.imag
    f_grid = (cfg.if_freq + cfg.acq_search_band
              - cfg.acq_search_step
              * np.arange(cfg.num_freq_bins)).astype(np.float32)
    ts = np.float32(1.0 / cfg.sampling_freq)

    args = ((jnp.asarray(slabs_r), jnp.asarray(slabs_i)),
            (jnp.asarray(cf_r), jnp.asarray(cf_i)),
            jnp.ones(1, jnp.float32), jnp.asarray(f_grid), ts)

    # NOTE: on remote/tunneled TPU backends block_until_ready() can return
    # before the device work completes; synchronize by fetching the small
    # outputs to host (adds one ~25 ms round-trip, measured separately).
    def run_acq():
        peak, b, ph, second, floor = _pcps_cdma_kernel(
            *args, n_noncoh=noncoh, n_comp=1, search_len=search_len)
        return np.asarray(peak)

    _dbg("acq compile...")
    run_acq()                          # compile
    _dbg("acq compiled")
    t0 = time.perf_counter()
    run_acq()
    t_acq = time.perf_counter() - t0
    grid_points = len(prns) * cfg.num_freq_bins * nfft * noncoh

    # ---------------- tracking workload -----------------------------------
    n_epochs = 2000                    # 2 s of signal per timed run
    n_channels = cfg.num_channels
    params = make_track_params(cfg, sig)
    n_samples = (n_epochs + 4) * spc
    samples = rng.integers(-16, 16, 2 * n_samples).astype(np.int8)
    channels = [(1 + k, cfg.if_freq + 500.0 * (k - 6), k * 1499)
                for k in range(n_channels)]
    from cusdr_tpu.tracking.engine import build_replica_tables
    dops = [c[1] - cfg.if_freq for c in channels]
    ctabs_np, ptabs_np = build_replica_tables(cfg, sig, params, channels,
                                              dops)
    ctabs = jnp.asarray(ctabs_np)
    ptabs = jnp.asarray(ptabs_np)
    state = init_channel_state(channels, sig.chip_rate_hz,
                               dopplers=[c[1]-cfg.if_freq for c in channels],
                               carrier_freq_hz=sig.carrier_freq_hz)
    samples_d = jnp.asarray(samples)

    def run_track():
        st, outs = track_superblock(samples_d, jnp.int64(0), ctabs, ptabs,
                                    state, params, n_epochs)
        return np.asarray(st.carr_freq)   # small fetch = real sync

    _dbg("seq track compile...")
    run_track()                        # compile
    _dbg("seq track compiled")
    t0 = time.perf_counter()
    run_track()
    t_track = time.perf_counter() - t0

    # ---------------- time-parallel tracking workload ---------------------
    # The sequence-parallel axis (parallel/timeblocks.py) also pays off
    # INTRA-chip: B concurrent blocks fill the VPU far better than one
    # serial scan.  Same total epochs, 40 blocks, run as one flat
    # 40x12-row channel bank over the full record (in-kernel HBM fetch)
    # when the Pallas path is on, else per-block buffers.
    # the vmapped per-block fallback compiles each block's program body
    # B times — keep B modest there so compile stays bounded; the flat
    # path scales B freely and amortizes the per-call dispatch + record
    # prep over a 10 s record (fixed costs measured ~60 ms on v5e)
    use_flat = params.use_pallas and params.fetch_in_kernel
    n_epochs_tp = 10_000 if use_flat else n_epochs
    n_blocks = 100 if use_flat else 10
    epb = n_epochs_tp // n_blocks
    starts_np = np.arange(n_blocks, dtype=np.int64) * (epb * spc)
    starts = jnp.asarray(starts_np)
    st_b = jax.tree.map(lambda x: jnp.stack([x] * n_blocks), state)
    st_b = st_b._replace(abs_sample=st_b.abs_sample + starts[:, None])

    if use_flat:
        from cusdr_tpu.parallel.timeblocks import _track_blocks_flat
        samples_tp = rng.integers(
            -16, 16, 2 * (n_epochs_tp + 4) * spc).astype(np.int8)
        _dbg("tp record to device...")
        samples_tp_d = jnp.asarray(samples_tp)
        jax.block_until_ready(samples_tp_d)
        _dbg("tp record on device")

        def run_track_tp():
            st, outs = _track_blocks_flat(samples_tp_d, ctabs, ptabs,
                                          st_b, params, epb, n_blocks)
            return np.asarray(st.carr_freq)
    else:
        from cusdr_tpu.parallel.timeblocks import _track_blocks
        blk_len = (epb + 4) * spc
        sbs = np.stack([samples[2 * s:2 * (s + blk_len)]
                        for s in starts_np])
        ends = jnp.asarray(starts_np + blk_len)
        sbs_d = jnp.asarray(sbs)

        def run_track_tp():
            st, outs = _track_blocks(sbs_d, starts, ends, ctabs, ptabs,
                                     st_b, params, epb)
            return np.asarray(st.carr_freq)

    _dbg("tp track compile...")
    run_track_tp()                     # compile
    _dbg("tp track compiled")
    t0 = time.perf_counter()
    run_track_tp()
    t_track_tp = time.perf_counter() - t0

    # ---------------- combined metric --------------------------------------
    track_rate_seq = n_epochs * spc / t_track        # samples/s
    track_rate_tp = n_epochs_tp * spc / t_track_tp
    track_rate = max(track_rate_seq, track_rate_tp)
    total_samples = 60.0 * cfg.sampling_freq         # 60 s record
    t_total = t_acq + total_samples / track_rate
    samples_per_sec = total_samples / t_total
    rt_factor = samples_per_sec / cfg.sampling_freq

    print(json.dumps({
        "metric": "IF samples/sec/chip (acq + 12-ch tracking)",
        "value": round(samples_per_sec, 1),
        "unit": "samples/s",
        "vs_baseline": round(rt_factor, 3),
        "detail": {
            "acq_time_s": round(t_acq, 4),
            "acq_grid_points_per_s": round(grid_points / t_acq, 1),
            "track_samples_per_s_sequential": round(track_rate_seq, 1),
            "track_samples_per_s_timeparallel": round(track_rate_tp, 1),
            "realtime_factor": round(rt_factor, 3),
            "device": str(jax.devices()[0]),
        },
    }))


if __name__ == "__main__":
    main()
