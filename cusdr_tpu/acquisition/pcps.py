"""Batched PCPS (parallel code-phase search) acquisition, TPU-first.

Reference semantics: GPS/GPS_L1CA/include/acquisition.m — per-PRN FFT
circular correlation over Doppler bins with non-coherent accumulation, GLRT
peak metric (acquisition.m:155-200), then a fine-frequency stage via long
coherent integration with bit-edge/secondary-code hypothesis search
(acquisition.m:203-260).

TPU redesign (not a port):
  * the Doppler-mixed signal FFT is computed ONCE for all PRNs
    (the reference recomputes it per PRN: acquisition.m:167-191);
  * all (PRN × Doppler × non-coherent) work is one jitted program —
    `lax.scan` over PRNs, batched FFTs over [bins, blocks, samples];
  * joint multi-component acquisition (data+pilot envelope sums with ICD
    power weights) is a weighted reduction over a components axis,
    generalizing GAL_E1C/include/acquisition.m:195 and
    BDS/B1C/include/acquisition.m:213-214;
  * FDMA (GLONASS) folds the per-channel carrier offset into the Doppler
    grid per PRN slot (GLO_GL1/include/acquisition.m:181-182).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.matmul_fft import fft_mm_ri, ifft_mm_ri, use_matmul_fft
from ..signals.defs import SignalDef, sample_code

# All device math is expressed over (real, imag) float32 pairs: the
# tunneled TPU PJRT backend has no complex64 support, and pairs lower to
# plain MXU/VPU ops on every backend.


def _fft_pair(xr, xi):
    """Backend-adaptive pair FFT: XLA FFT on CPU/GPU, MXU matmul-FFT
    elsewhere (ops/matmul_fft.py)."""
    if use_matmul_fft():
        return fft_mm_ri(xr, xi, -1.0)
    y = jnp.fft.fft(jax.lax.complex(xr, xi), axis=-1)
    return jnp.real(y), jnp.imag(y)


def _ifft_pair(xr, xi):
    if use_matmul_fft():
        return ifft_mm_ri(xr, xi)
    y = jnp.fft.ifft(jax.lax.complex(xr, xi), axis=-1)
    return jnp.real(y), jnp.imag(y)


@dataclass
class AcquisitionResult:
    """Per-PRN acquisition outputs (mirrors acqResults struct,
    acquisition.m:128-134)."""
    prns: np.ndarray           # PRN (or FDMA channel) ids searched
    carr_freq: np.ndarray      # detected carrier freq [Hz] (0 if none)
    code_phase: np.ndarray     # sample offset of code start (0-based)
    peak_metric: np.ndarray    # GLRT statistic peak/σ/N_noncoh
    detected: np.ndarray       # bool mask (metric > threshold)
    coarse_freq: np.ndarray    # coarse-stage bin freq [Hz]
    pilot_phase: np.ndarray | None = None   # long-pilot phase hypothesis
                                            # (L2C CL period index)

    def best_channels(self, n: int):
        """PRNs sorted by peak metric, detected first (preRun.m:60-72).

        Tuples are (prn, carr_freq, code_phase, pilot_phase) — the 4th
        element seeds the long-pilot period counter (L2C CLCodePhase,
        GPS_L2C/include/tracking.m:161-163)."""
        order = np.argsort(-self.peak_metric)
        order = [i for i in order if self.detected[i]][:n]
        pp = self.pilot_phase if self.pilot_phase is not None \
            else np.zeros(len(self.prns), np.int64)
        return [(int(self.prns[i]), float(self.carr_freq[i]),
                 int(self.code_phase[i]), int(pp[i])) for i in order]


# --------------------------------------------------------------------------
# Coarse stage
# --------------------------------------------------------------------------

def _mixed_fft(slabs_r, slabs_i, f_grid, ts):
    """FFT of the Doppler-mixed signal: pair of [n_bins, n_noncoh, nfft].

    Mixing by e^{-jθ}: (sr + j·si)(cosθ - j·sinθ)."""
    nfft = slabs_r.shape[-1]
    n = jnp.arange(nfft, dtype=jnp.float32)
    phase = (2.0 * jnp.pi * ts) * f_grid[:, None] * n[None, :]
    c = jnp.cos(phase)[:, None, :]
    sn = jnp.sin(phase)[:, None, :]
    mr = slabs_r[None] * c + slabs_i[None] * sn
    mi = slabs_i[None] * c - slabs_r[None] * sn
    return _fft_pair(mr, mi)


def _corr_peak(mf, cfftc, weights, n_comp, search_len=None,
               excl_samples: int = 0):
    """Envelope-summed correlation peak for one PRN.

    mf: pair of [n_bins, n_noncoh, nfft]; cfftc: pair of [n_comp, nfft].
    The FFT length is padded to a power of two; only the first
    ``search_len`` lags (= 2 code periods, the reference's search span,
    acquisition.m:160-162) are scanned for the peak.
    Returns (peak, bin, phase, second_peak) where second_peak is the
    largest value in the peak's Doppler row outside ±excl_samples of the
    peak (the L2C/B1I second-peak-ratio metric,
    GPS_L2C/include/acquisition.m:90-112).
    """
    mfr, mfi = mf
    cfr, cfi = cfftc
    nfft = mfr.shape[-1]
    search = nfft if search_len is None else search_len
    acc = jnp.zeros((mfr.shape[0], search), jnp.float32)
    for c in range(n_comp):
        pr = mfr * cfr[c][None, None, :] - mfi * cfi[c][None, None, :]
        pi = mfr * cfi[c][None, None, :] + mfi * cfr[c][None, None, :]
        ir, ii = _ifft_pair(pr, pi)
        acc = acc + weights[c] * jnp.hypot(
            ir[..., :search], ii[..., :search]).sum(axis=1)
    flat = acc.reshape(-1)
    k = jnp.argmax(flat)
    peak_bin = k // search
    peak_phase = k % search
    row = acc[peak_bin]
    lags = jnp.arange(search)
    # the search spans 2 code periods, so the true peak repeats at
    # ±one period: exclude the neighborhood periodically (mod spc)
    spc = search // 2
    d = jnp.mod(lags - peak_phase, spc)
    dist = jnp.minimum(d, spc - d)
    masked = jnp.where(dist > excl_samples, row, 0.0)
    return flat[k], peak_bin, peak_phase, jnp.max(masked)


@functools.partial(jax.jit,
                   static_argnames=("n_noncoh", "n_comp", "search_len",
                                    "excl_samples"))
def _pcps_cdma_kernel(slabs, code_fft_conj, weights, f_grid, ts,
                      n_noncoh: int, n_comp: int, search_len: int,
                      excl_samples: int = 0):
    """CDMA PCPS: the mixed-signal FFT is computed ONCE and shared by all
    PRNs (the reference recomputes it per PRN: acquisition.m:167-191).

    slabs: pair of [n_noncoh, nfft]; code_fft_conj: pair of
    [n_prn, n_comp, nfft]; f_grid [n_bins].
    Returns (peak, bin, phase) each [n_prn].
    """
    mf = _mixed_fft(slabs[0], slabs[1], f_grid, ts)

    def one_prn(carry, cfftc):
        return carry, _corr_peak(mf, cfftc, weights, n_comp, search_len,
                                 excl_samples)

    _, out = jax.lax.scan(one_prn, 0, code_fft_conj)
    return out


@functools.partial(jax.jit,
                   static_argnames=("n_noncoh", "n_comp", "search_len",
                                    "excl_samples"))
def _pcps_fdma_kernel(slabs, code_fft_conj, weights, freqs, ts,
                      n_noncoh: int, n_comp: int, search_len: int,
                      excl_samples: int = 0):
    """FDMA PCPS (GLONASS): one shared code, per-channel carrier grids
    (GLO_GL1/include/acquisition.m:181-182).

    freqs [n_chan, n_bins]; code_fft_conj: pair of [1, n_comp, nfft]
    (shared code).
    """
    def one_chan(carry, f_grid):
        mf = _mixed_fft(slabs[0], slabs[1], f_grid, ts)
        return carry, _corr_peak(mf, (code_fft_conj[0][0],
                                      code_fft_conj[1][0]),
                                 weights, n_comp, search_len,
                                 excl_samples)

    _, out = jax.lax.scan(one_chan, 0, freqs)
    return out


# --------------------------------------------------------------------------
# Fine stage
# --------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("envelope",))
def _fine_kernel(sig_r, sig_i, code_replica, freqs, hyp, ts,
                 envelope: bool = False):
    """Fine-frequency search by long coherent integration.

    sig_r/sig_i:  [n_codes * spc] float32 I/Q starting at the code edge
    code_replica: [n_codes * spc] float32 (±1 sampled replica)
    freqs:        [n_fine] float32 candidate carrier frequencies
    hyp:          [n_hyp, n_codes] float32 — coherent-combination
                  hypotheses over per-code sums (bit-edge windows,
                  NH/secondary-code phases; acquisition.m:235-248,
                  GPS_L5C/include/acquisition.m:241-275)
    envelope:     sum |per-code sums| instead (data-sign-insensitive fine
                  search for long-code signals, B1C-style)

    Returns power [n_fine] (max over hypotheses).
    """
    n_codes = hyp.shape[1]
    spc = sig_r.shape[0] // n_codes
    n = jnp.arange(sig_r.shape[0], dtype=jnp.float32)
    wr = sig_r * code_replica
    wi = sig_i * code_replica

    def one_freq(f):
        phase = (2.0 * jnp.pi * ts) * f * n
        c, sn = jnp.cos(phase), jnp.sin(phase)
        sr = (wr * c + wi * sn).reshape(n_codes, spc).sum(axis=1)
        si = (wi * c - wr * sn).reshape(n_codes, spc).sum(axis=1)
        if envelope:
            return jnp.sum(jnp.hypot(sr, si))
        return jnp.max(jnp.hypot(hyp @ sr, hyp @ si))

    return jax.vmap(one_freq)(freqs)


def _bit_edge_hypotheses(n_codes: int, window: int) -> np.ndarray:
    """Sliding all-ones windows: nav-bit-edge search
    (acquisition.m:240-248)."""
    n_hyp = n_codes - window + 1
    H = np.zeros((n_hyp, n_codes), np.float32)
    for k in range(n_hyp):
        H[k, k:k + window] = 1.0
    return H


def _secondary_hypotheses(secondary: np.ndarray, n_codes: int) -> np.ndarray:
    """All circular shifts of a secondary code, tiled to n_codes
    (GPS_L5C/include/acquisition.m:241-275)."""
    m = len(secondary)
    reps = int(np.ceil(n_codes / m))
    H = np.zeros((m, n_codes), np.float32)
    for k in range(m):
        H[k] = np.tile(np.roll(secondary, k), reps)[:n_codes]
    return H


# --------------------------------------------------------------------------
# Public API
# --------------------------------------------------------------------------

def acquire(cfg, sig: SignalDef, samples: np.ndarray,
            prn_list: Optional[Sequence[int]] = None,
            fine_n_codes: Optional[int] = None) -> AcquisitionResult:
    """Run coarse+fine acquisition over ``prn_list``.

    samples: complex IF samples; needs at least
    (acq_non_coh_time + 1 + fine_n_codes) code periods.
    """
    from .resample import maybe_resample, recover
    samples, cfg, rs_info = maybe_resample(np.asarray(samples), cfg)

    prns = np.asarray(list(prn_list if prn_list is not None
                           else cfg.acq_satellite_list))
    spc = cfg.samples_per_code
    # FFT length: next power of two >= 2 code periods (pow2 keeps the TPU
    # FFT path fast/supported; peak search stays on the reference's
    # 2-code-period span)
    search_len = 2 * spc
    nfft = 1 << (search_len - 1).bit_length()
    noncoh = cfg.acq_non_coh_time
    fs = cfg.sampling_freq
    ts = np.float32(1.0 / fs)

    # ---- build signal slabs [noncoh, 2*spc] (acquisition.m:175-178) -------
    assert len(samples) >= (noncoh + 1) * spc, \
        f"need {(noncoh + 1) * spc} samples, got {len(samples)}"
    idx = (np.arange(noncoh)[:, None] * spc
           + np.arange(search_len)[None, :])
    win = np.asarray(samples)[idx]
    slabs_r = np.zeros((noncoh, nfft), np.float32)
    slabs_i = np.zeros((noncoh, nfft), np.float32)
    slabs_r[:, :search_len] = np.real(win)
    slabs_i[:, :search_len] = np.imag(win)

    # ---- code FFT tables [n_prn, n_comp, nfft] ----------------------------
    comps = sig.acq_code_fns()
    n_comp = len(comps)
    weights = np.asarray(sig.acq_weights[:n_comp], np.float32)
    cf_r = np.empty((len(prns), n_comp, nfft), np.float32)
    cf_i = np.empty((len(prns), n_comp, nfft), np.float32)
    for i, prn in enumerate(prns):
        for c, fn in enumerate(comps):
            table = sample_code(fn(int(prn)) if not sig.fdma
                                else fn(0), sig.elements_per_chip,
                                sig.chip_rate_hz, fs, spc)
            padded = np.zeros(nfft, np.float32)
            padded[:spc] = table.astype(np.float32)
            cfc = np.conj(np.fft.fft(padded))
            cf_r[i, c] = cfc.real
            cf_i[i, c] = cfc.imag

    # ---- Doppler grid per PRN (descending: acquisition.m:169-170) ---------
    band, step = cfg.acq_search_band, cfg.acq_search_step
    n_bins = cfg.num_freq_bins
    base = (cfg.if_freq + band - step * np.arange(n_bins)).astype(np.float32)
    excl = int(round(fs / sig.chip_rate_hz)) + 1   # ±1 chip exclusion
    if sig.fdma:
        # GLONASS: 'PRN' is the frequency channel K
        # (GLO_GL1/include/acquisition.m:181-182)
        offs = (prns * sig.fdma_spacing_hz).astype(np.float32)
        freqs = base[None, :] + offs[:, None]
        freqs = np.ascontiguousarray(freqs)
        peak, bin_idx, phase_idx, second = _pcps_fdma_kernel(
            (jnp.asarray(slabs_r), jnp.asarray(slabs_i)),
            (jnp.asarray(cf_r[:1]), jnp.asarray(cf_i[:1])),
            jnp.asarray(weights), jnp.asarray(freqs), ts,
            n_noncoh=noncoh, n_comp=n_comp, search_len=search_len,
            excl_samples=excl)
    else:
        freqs = np.broadcast_to(base, (len(prns), n_bins))
        peak, bin_idx, phase_idx, second = _pcps_cdma_kernel(
            (jnp.asarray(slabs_r), jnp.asarray(slabs_i)),
            (jnp.asarray(cf_r), jnp.asarray(cf_i)),
            jnp.asarray(weights), jnp.asarray(base), ts,
            n_noncoh=noncoh, n_comp=n_comp, search_len=search_len,
            excl_samples=excl)
    peak = np.asarray(peak)
    bin_idx = np.asarray(bin_idx)
    phase_idx = np.asarray(phase_idx)
    second = np.asarray(second)

    if cfg.acq_metric == "second_peak":
        # peak / second-peak ratio (GPS_L2C/include/acquisition.m:90-112)
        metric = peak / np.maximum(second, 1e-12)
    else:
        # GLRT statistic (acquisition.m:150-151,200)
        sig_power = np.sqrt(np.var(np.asarray(samples[:spc])) * spc)
        metric = peak / sig_power / noncoh
        # weighted components change the envelope scale; normalize so the
        # threshold stays comparable to the single-component GLRT
        metric = metric / weights.sum()
    detected = metric > cfg.acq_threshold

    coarse_freq = freqs[np.arange(len(prns)), bin_idx]

    # ---- fine frequency stage (acquisition.m:203-260) ---------------------
    # Strategy per signal class (generalizing the per-receiver variants):
    #   * pilot with a short secondary (≤100 chips): wipe the pilot code
    #     and try every secondary-code phase (L5C NH20, E5a CS100, E1C
    #     CS25 — GPS_L5C/include/acquisition.m:241-275,
    #     GAL_E5a/include/acquisition.m:229-253)
    #   * data-only with NH secondary: same over the data component
    #   * plain data (L1CA): sliding nav-bit-edge windows
    #     (acquisition.m:240-248)
    #   * long secondary (B1C 1800): data-sign-insensitive envelope fine
    #     search (BDS/B1C/include/acquisition.m:262-263 CW-style)
    n_codes = fine_n_codes or max(
        int(round(40.0 / max(sig.code_period_ms, 1e-9))), 4)
    carr_freq = np.zeros(len(prns))
    code_phase = np.zeros(len(prns), np.int64)
    fine_step = cfg.fine_search_step
    n_fine = int(round(cfg.acq_search_step / fine_step)) + 1

    nav_codes = max(int(round(sig.nav_symbol_ms / sig.code_period_ms)), 1)

    def fine_setup(prn: int):
        """(code_fn, hypotheses H or None=envelope) for this PRN."""
        psec = sig.pilot_secondary(int(prn)) \
            if sig.pilot_secondary is not None else None
        if sig.pilot_code is not None and psec is None:
            # pilot with no secondary modulation: fully coherent
            # (L2C CL, B2a pilot).  NOTE: for L2C the CL phase within its
            # 1.5 s period is resolved separately (CL-phase search,
            # GPS_L2C/include/acquisition.m:127-167); in this fine stage
            # the replica starts at phase 0.
            return sig.pilot_code, np.ones((1, n_codes), np.float32)
        if psec is not None and len(psec) <= 100:
            return sig.pilot_code, _secondary_hypotheses(psec, n_codes)
        if sig.data_secondary is not None \
                and len(sig.data_secondary) <= 100:
            return sig.data_code, _secondary_hypotheses(
                sig.data_secondary, n_codes)
        if nav_codes > 1:
            return sig.data_code, _bit_edge_hypotheses(
                n_codes, min(nav_codes, max(n_codes // 2, 1)))
        if nav_codes == 1 and psec is None:
            # symbol per code period, no pilot: coherent over one code
            return sig.data_code, np.eye(n_codes, dtype=np.float32)
        return sig.data_code, None     # envelope mode

    pilot_phase = np.zeros(len(prns), np.int64)
    for i, prn in enumerate(prns):
        if not detected[i]:
            continue
        cp = int(phase_idx[i])
        need = cp + n_codes * spc
        if need > len(samples):
            cp = cp - spc  # fall back one code period
        seg = np.asarray(samples[cp:cp + n_codes * spc])
        # long-pilot phase search FIRST (coarse freq is good enough for
        # one coherent code period) so the pilot-based fine stage uses
        # the right pilot segment (GPS_L2C/include/acquisition.m:127-167)
        nhyp = sig.pilot_phase_hypotheses
        if nhyp > 1 and sig.pilot_code is not None:
            one_code = np.asarray(samples[cp:cp + spc])
            t = np.arange(spc) / fs
            wiped = one_code * np.exp(-2j * np.pi * coarse_freq[i] * t)
            pilot_elems = sig.pilot_code(int(prn))
            epc_ = sig.elements_per_chip
            n_elem_period = sig.code_length_chips * epc_
            eidx = np.floor(np.arange(spc) * (sig.chip_rate_hz / fs)
                            * epc_).astype(np.int64)
            powers_cl = np.empty(nhyp)
            for h in range(nhyp):
                rep = pilot_elems[(eidx + h * n_elem_period)
                                  % len(pilot_elems)]
                powers_cl[h] = np.abs(np.sum(wiped * rep))
            pilot_phase[i] = int(np.argmax(powers_cl))
        code_fn, H = fine_setup(int(prn))
        elems = code_fn(0 if sig.fdma else int(prn))
        # pilot-based fine on a long pilot starts at the resolved phase
        fine_offset_chips = 0.0
        if nhyp > 1 and code_fn is sig.pilot_code:
            fine_offset_chips = float(pilot_phase[i]
                                      * sig.code_length_chips)
        replica = sample_code(elems, sig.elements_per_chip,
                              sig.chip_rate_hz, fs,
                              n_codes * spc,
                              code_phase_chips=fine_offset_chips
                              ).astype(np.float32)
        fine_freqs = (coarse_freq[i] + cfg.acq_search_step / 2
                      - fine_step * np.arange(n_fine)).astype(np.float32)
        envelope = H is None
        Hj = jnp.asarray(np.ones((1, n_codes), np.float32) if envelope
                         else H)
        powers = np.asarray(_fine_kernel(
            jnp.asarray(np.real(seg).astype(np.float32)),
            jnp.asarray(np.imag(seg).astype(np.float32)),
            jnp.asarray(replica), jnp.asarray(fine_freqs),
            Hj, ts, envelope=envelope))
        carr_freq[i] = fine_freqs[int(np.argmax(powers))]
        if carr_freq[i] == 0.0:
            carr_freq[i] = 1.0   # acquisition.m:257-260
        code_phase[i] = int(phase_idx[i])
        # downsampling recovery (acquisition.m:262-282)
        code_phase[i], carr_freq[i] = recover(code_phase[i],
                                              carr_freq[i], rs_info)

    return AcquisitionResult(
        prns=prns, carr_freq=carr_freq, code_phase=code_phase,
        peak_metric=np.asarray(metric), detected=np.asarray(detected),
        coarse_freq=np.asarray(coarse_freq), pilot_phase=pilot_phase)
