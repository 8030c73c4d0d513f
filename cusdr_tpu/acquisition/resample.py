"""Bandpass-sampling front end for acquisition speed-up.

Equivalent of GPS/GPS_L1CA/include/acquisition.m:46-111 and the
downsampling recovery at :262-282: when fs > resampling_threshold and
resampling_flag is set, the IF signal is FIR-bandpass filtered around the
code main lobe (fir1(700,[w1 w2]) + filtfilt) and decimated by
nearest-sample selection to a bandpass-sampling-legal rate; acquisition
runs at the low rate and the detected code phase / carrier frequency are
mapped back to the original rate.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


def fir1_bandpass(order: int, w1: float, w2: float) -> np.ndarray:
    """Hamming-windowed linear-phase bandpass FIR (MATLAB fir1 semantics;
    w in (0,1) normalized to Nyquist)."""
    m = np.arange(order + 1) - order / 2.0
    # ideal bandpass impulse response
    def sinc_lp(w):
        return w * np.sinc(w * m)
    h = sinc_lp(w2) - sinc_lp(w1)
    h *= np.hamming(order + 1)
    # unity gain at band center
    wc = (w1 + w2) / 2.0
    gain = np.abs(np.sum(h * np.exp(-1j * np.pi * wc
                                    * np.arange(order + 1))))
    return h / gain


def _fftconvolve_same(x: np.ndarray, h: np.ndarray) -> np.ndarray:
    n = len(x) + len(h) - 1
    nfft = 1 << (n - 1).bit_length()
    y = np.fft.ifft(np.fft.fft(x, nfft) * np.fft.fft(h, nfft))[:n]
    lo = (len(h) - 1) // 2
    out = y[lo:lo + len(x)]
    return out if np.iscomplexobj(x) else out.real


@dataclass
class ResampleInfo:
    enabled: bool
    old_fs: float = 0.0
    new_fs: float = 0.0
    old_if: float = 0.0
    new_if: float = 0.0


def maybe_resample(samples: np.ndarray, cfg):
    """Return (samples', cfg', info) — decimated per the bandpass sampling
    theorem when enabled (acquisition.m:50-111)."""
    if not (cfg.resampling_flag
            and cfg.sampling_freq > cfg.resampling_threshold):
        return samples, cfg, ResampleInfo(False)
    fs = cfg.sampling_freq
    bw = cfg.code_freq_basis * 2 + 0.5e6
    w1 = (cfg.if_freq - bw / 2) * 2 / fs
    w2 = (cfg.if_freq + bw / 2) * 2 / fs
    h = fir1_bandpass(700, max(w1, 1e-6), min(w2, 0.999))
    filtered = _fftconvolve_same(_fftconvolve_same(samples, h), h)

    fu = cfg.if_freq + bw / 2
    n = max(int(fu // bw), 1)
    lower = 2 * fu / n
    fl = cfg.if_freq - bw / 2
    upper = 2 * fl / (n - 1) if n > 1 else lower
    new_fs = float(np.ceil((lower + upper) / 2))

    sig_len = int(np.floor((len(filtered) - 1) / fs * new_fs))
    idx = np.ceil(np.arange(sig_len) / new_fs * fs).astype(np.int64)
    idx[0] = 0
    resampled = filtered[idx]
    new_if = float(np.remainder(cfg.if_freq, new_fs))
    new_cfg = cfg.replace(sampling_freq=new_fs, if_freq=new_if)
    return resampled, new_cfg, ResampleInfo(True, fs, new_fs,
                                            cfg.if_freq, new_if)


def recover(code_phase: int, carr_freq: float, info: ResampleInfo):
    """Map low-rate acquisition results back to the original sampling rate
    (acquisition.m:262-282)."""
    if not info.enabled:
        return code_phase, carr_freq
    new_phase = int(np.floor(code_phase / info.new_fs * info.old_fs))
    if info.new_if >= info.new_fs / 2:
        doppler = (info.new_fs - info.new_if) - carr_freq
    else:
        doppler = carr_freq - info.new_if
    return new_phase, doppler + info.old_if
