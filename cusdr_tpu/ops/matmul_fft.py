"""FFT as MXU matmuls: four-step Cooley-Tukey with DFT-matrix factors.

The PCPS acquisition engine needs batched 2^k-point FFTs.  On TPU the
natural formulation is the classic systolic-array one: factor N = N1·N2,
run the length-N1 DFTs of all columns as ONE [N1,N1]x[N1, B·N2] matmul,
twiddle, then the length-N2 DFTs as matmuls again — all dense MXU work
instead of a scalar butterfly network.  (This also sidesteps PJRT backends
without an FFT lowering.)

Accuracy: f32 DFT factors of size ≤256 give ~1e-5 relative error — far
below the acquisition noise floor.

fft_mm/ifft_mm operate over the last axis; N must be a power of two
(≥ 4096 uses 256-sized factors; smaller sizes fall back to one DFT
matmul).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def _dft_matrix(n: int, sign: float):
    k = np.arange(n)
    w = np.exp(sign * 2j * np.pi * np.outer(k, k) / n)
    return jnp.asarray(w.astype(np.complex64))


@functools.lru_cache(maxsize=None)
def _twiddle(n1: int, n2: int, sign: float):
    k1 = np.arange(n1)[:, None]
    n2v = np.arange(n2)[None, :]
    w = np.exp(sign * 2j * np.pi * k1 * n2v / (n1 * n2))
    return jnp.asarray(w.astype(np.complex64))


def _split(n: int):
    """Factor n = n1*n2 with both ≤ 4096ish and MXU-friendly."""
    n1 = 1 << ((n.bit_length() - 1) // 2)
    return n1, n // n1


def _cmatmul(a, b):
    """Complex matmul via real MXU matmuls with f32 accumulation."""
    ar, ai = jnp.real(a), jnp.imag(a)
    br, bi = jnp.real(b), jnp.imag(b)
    rr = jnp.dot(ar, br, preferred_element_type=jnp.float32) \
        - jnp.dot(ai, bi, preferred_element_type=jnp.float32)
    ri = jnp.dot(ar, bi, preferred_element_type=jnp.float32) \
        + jnp.dot(ai, br, preferred_element_type=jnp.float32)
    return jax.lax.complex(rr, ri)


def _fft_mm_1d(x, sign: float):
    """x: [..., N] complex64; returns DFT along last axis."""
    n = x.shape[-1]
    if n <= 1024:
        w = _dft_matrix(n, sign)
        flat = x.reshape(-1, n)
        return _cmatmul(flat, w.T).reshape(x.shape)
    n1, n2 = _split(n)
    batch = x.shape[:-1]
    a = x.reshape(-1, n1, n2)                    # n = n1*n2, row-major
    nb = a.shape[0]
    # step 1: length-n1 DFT over axis 1 -> [B, k1, n2]:
    # W1 [k1,n1] @ A [n1, B*n2] as real MXU matmuls
    w1 = _dft_matrix(n1, sign)
    a_mat = jnp.swapaxes(a, 0, 1).reshape(n1, nb * n2)
    b = _cmatmul(w1, a_mat).reshape(n1, nb, n2)
    b = jnp.swapaxes(b, 0, 1)                    # [B, k1, n2]
    # step 2: twiddle ω^(±k1·n2)
    b = b * _twiddle(n1, n2, sign)[None, :, :]
    # step 3: length-n2 DFT over axis 2 (DFT matrix is symmetric)
    w2 = _dft_matrix(n2, sign)
    c = _cmatmul(b.reshape(nb * n1, n2), w2).reshape(nb, n1, n2)
    # step 4: output index X[k1 + n1*k2] -> lay out as [k2, k1]
    out = jnp.swapaxes(c, -1, -2).reshape(*batch, n)
    return out


def fft_mm(x) -> jnp.ndarray:
    """Batched FFT over the last axis (power-of-two length)."""
    return _fft_mm_1d(jnp.asarray(x, jnp.complex64), -1.0)


def ifft_mm(x) -> jnp.ndarray:
    """Batched inverse FFT over the last axis (power-of-two length)."""
    n = x.shape[-1]
    return _fft_mm_1d(jnp.asarray(x, jnp.complex64), +1.0) / n


def use_matmul_fft() -> bool:
    """True when the runtime backend lacks a usable XLA FFT (e.g. the
    tunneled PJRT TPU plugin)."""
    try:
        return jax.default_backend() not in ("cpu", "gpu")
    except Exception:
        return False
