"""FFT as MXU matmuls: four-step Cooley-Tukey with DFT-matrix factors.

The PCPS acquisition engine needs batched 2^k-point FFTs.  On TPU the
natural formulation is the classic systolic-array one: factor N = N1·N2,
run the length-N1 DFTs of all columns as ONE [N1,N1]x[N1, B·N2] matmul,
twiddle, then the length-N2 DFTs as matmuls again — all dense MXU work
instead of a scalar butterfly network.

Everything is expressed over (real, imag) float32 PAIRS — some PJRT
backends (the tunneled TPU plugin used here) have no complex64 support at
all, and pairs lower to plain MXU/VPU ops everywhere.

Accuracy: f32 DFT factors of size ≤1024 give ~1e-6 relative error — far
below the acquisition noise floor.

API: fft_mm_ri / ifft_mm_ri operate on pairs over the last axis;
fft_mm / ifft_mm are complex-dtype conveniences for tests/CPU use.
N must be a power of two.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def _dft_matrix(n: int, sign: float):
    k = np.arange(n)
    ang = sign * 2.0 * np.pi * np.outer(k, k) / n
    return (jnp.asarray(np.cos(ang).astype(np.float32)),
            jnp.asarray(np.sin(ang).astype(np.float32)))


@functools.lru_cache(maxsize=None)
def _twiddle(n1: int, n2: int, sign: float):
    k1 = np.arange(n1)[:, None]
    n2v = np.arange(n2)[None, :]
    ang = sign * 2.0 * np.pi * k1 * n2v / (n1 * n2)
    return (jnp.asarray(np.cos(ang).astype(np.float32)),
            jnp.asarray(np.sin(ang).astype(np.float32)))


def _split(n: int):
    """Factor n = n1*n2 (n1 ≤ n2), both MXU-friendly."""
    n1 = 1 << ((n.bit_length() - 1) // 2)
    return n1, n // n1


def _mm(a, b):
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


def _cmatmul_ri(ar, ai, br, bi):
    """(ar+i·ai) @ (br+i·bi) as four real MXU matmuls."""
    return (_mm(ar, br) - _mm(ai, bi), _mm(ar, bi) + _mm(ai, br))


def _cmul_ri(ar, ai, br, bi):
    """Elementwise complex multiply on pairs."""
    return ar * br - ai * bi, ar * bi + ai * br


def fft_mm_ri(xr, xi, sign: float = -1.0):
    """Pair-form DFT over the last axis; returns (yr, yi)."""
    xr = jnp.asarray(xr, jnp.float32)
    xi = jnp.asarray(xi, jnp.float32)
    n = xr.shape[-1]
    batch = xr.shape[:-1]
    if n <= 1024:
        wr, wi = _dft_matrix(n, sign)
        fr = xr.reshape(-1, n)
        fi = xi.reshape(-1, n)
        yr, yi = _cmatmul_ri(fr, fi, wr, wi)   # DFT matrix symmetric
        return yr.reshape(*batch, n), yi.reshape(*batch, n)
    n1, n2 = _split(n)
    ar = xr.reshape(-1, n1, n2)
    ai = xi.reshape(-1, n1, n2)
    nb = ar.shape[0]
    # step 1: length-n1 DFT over axis 1: W1 [k1,n1] @ A [n1, B*n2]
    w1r, w1i = _dft_matrix(n1, sign)
    amr = jnp.swapaxes(ar, 0, 1).reshape(n1, nb * n2)
    ami = jnp.swapaxes(ai, 0, 1).reshape(n1, nb * n2)
    br, bi = _cmatmul_ri(w1r, w1i, amr, ami)
    br = jnp.swapaxes(br.reshape(n1, nb, n2), 0, 1)   # [B, k1, n2]
    bi = jnp.swapaxes(bi.reshape(n1, nb, n2), 0, 1)
    # step 2: twiddle ω^(±k1·n2)
    twr, twi = _twiddle(n1, n2, sign)
    br, bi = _cmul_ri(br, bi, twr[None], twi[None])
    # step 3: length-n2 DFT over axis 2 (DFT matrix symmetric)
    w2r, w2i = _dft_matrix(n2, sign)
    cr, ci = _cmatmul_ri(br.reshape(nb * n1, n2), bi.reshape(nb * n1, n2),
                         w2r, w2i)
    cr = cr.reshape(nb, n1, n2)
    ci = ci.reshape(nb, n1, n2)
    # step 4: output index X[k1 + n1*k2] -> lay out as [k2, k1]
    yr = jnp.swapaxes(cr, -1, -2).reshape(*batch, n)
    yi = jnp.swapaxes(ci, -1, -2).reshape(*batch, n)
    return yr, yi


def ifft_mm_ri(xr, xi):
    n = xr.shape[-1]
    yr, yi = fft_mm_ri(xr, xi, +1.0)
    return yr / n, yi / n


# --- complex-dtype conveniences (tests / CPU paths) -------------------------

def fft_mm(x) -> jnp.ndarray:
    x = jnp.asarray(x, jnp.complex64)
    yr, yi = fft_mm_ri(jnp.real(x), jnp.imag(x), -1.0)
    return jax.lax.complex(yr, yi)


def ifft_mm(x) -> jnp.ndarray:
    x = jnp.asarray(x, jnp.complex64)
    yr, yi = ifft_mm_ri(jnp.real(x), jnp.imag(x))
    return jax.lax.complex(yr, yi)


def use_matmul_fft() -> bool:
    """True when the runtime backend lacks usable complex64/XLA-FFT
    support (e.g. the tunneled PJRT TPU plugin)."""
    try:
        return jax.default_backend() not in ("cpu", "gpu")
    except Exception:
        return False
