"""Native C runtime loader vs numpy fallbacks."""

import numpy as np
import pytest

from cusdr_tpu import runtime


pytestmark = pytest.mark.skipif(not runtime.available(),
                                reason="native library not built")


def test_unpack_2bit_matches_numpy():
    from cusdr_tpu.io import ingest
    rng = np.random.default_rng(0)
    raw = rng.integers(0, 256, 4096).astype(np.uint8)
    native = runtime.unpack_2bit_iq(raw)
    # numpy reference path (bypassing the native shortcut)
    def val(sign_bit, mag_bit):
        mag = np.where((raw >> mag_bit) & 1, 3, 1).astype(np.int8)
        sign = np.where((raw >> sign_bit) & 1, -1, 1).astype(np.int8)
        return mag * sign
    ref = np.empty(raw.size * 4, np.int8)
    ref[0::4] = val(0, 2)
    ref[1::4] = val(1, 3)
    ref[2::4] = val(4, 6)
    ref[3::4] = val(5, 7)
    assert np.array_equal(native, ref)


def test_deinterleave():
    rng = np.random.default_rng(1)
    iq8 = rng.integers(-128, 128, 2000).astype(np.int8)
    i, q = runtime.deinterleave_to_f32(iq8)
    assert np.array_equal(i, iq8[0::2].astype(np.float32))
    assert np.array_equal(q, iq8[1::2].astype(np.float32))
    iq16 = rng.integers(-30000, 30000, 2000).astype(np.int16)
    i, q = runtime.deinterleave_to_f32(iq16)
    assert np.array_equal(i, iq16[0::2].astype(np.float32))


def test_real_to_iq():
    x = np.arange(-5, 5, dtype=np.int8)
    out = runtime.real_to_iq(x)
    assert np.array_equal(out[0::2], x)
    assert np.all(out[1::2] == 0)
