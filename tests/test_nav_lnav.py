"""LNAV codec tests: parity equations, encoder/decoder round-trip."""

import numpy as np
import pytest

from cusdr_tpu.nav import lnav

EPH = dict(weekNumber=1214.0, accuracy=0.0, health=0.0, IODC=57.0,
           T_GD=5.122274e-09, t_oc=396000.0, a_f2=0.0,
           a_f1=-3.183231e-12, a_f0=-4.69237566e-04,
           IODE_sf2=57.0, C_rs=-115.40625, deltan=4.24874e-09,
           M_0=1.19731, C_uc=-6.0331e-06, e=0.00967859, C_us=5.1148e-06,
           sqrtA=5153.6524, t_oe=396000.0, C_ic=-9.8720e-08,
           omega_0=2.46209, C_is=1.3225e-07, i_0=0.958511,
           C_rc=255.34375, omega=0.97187, omegaDot=-8.08297e-09,
           IODE_sf3=57.0, iDot=-4.89306e-10)


class TestParity:
    def test_roundtrip_word(self):
        rng = np.random.default_rng(0)
        d29s = d30s = 0
        for _ in range(50):
            data = rng.integers(0, 2, 24).astype(np.int8)
            word = lnav.encode_word(data, d29s, d30s)
            ok, decoded = lnav.check_word(word, d29s, d30s)
            assert ok
            assert np.array_equal(decoded, data)
            d29s, d30s = int(word[28]), int(word[29])

    def test_single_bit_error_detected(self):
        data = np.ones(24, np.int8)
        word = lnav.encode_word(data, 0, 0)
        for k in range(30):
            bad = word.copy()
            bad[k] ^= 1
            ok, _ = lnav.check_word(bad, 0, 0)
            assert not ok, k

    def test_solve_tail_forces_zero_parity(self):
        rng = np.random.default_rng(1)
        for trial in range(20):
            data = rng.integers(0, 2, 24).astype(np.int8)
            d29s, d30s = int(rng.integers(2)), int(rng.integers(2))
            word = lnav.encode_word(data, d29s, d30s, solve_tail=True)
            assert word[28] == 0 and word[29] == 0


class TestFrameCodec:
    def test_eph_roundtrip(self):
        bits = lnav.encode_frame(EPH, tow_first=395994)
        dec, tow = lnav.decode_frame(bits)
        assert tow == 395994
        assert dec["idValid"] >= {1, 2, 3}
        for k, v in EPH.items():
            got = dec[k]
            # fields are LSB-quantized; tolerance = one LSB of each field
            assert got == pytest.approx(v, rel=1e-6, abs=abs(v) * 1e-6
                                        + 1e-10), k

    def test_parity_chain_across_frames(self):
        stream = lnav.nav_bit_stream(EPH, 395994, n_frames=2)
        bits = ((stream + 1) // 2).astype(np.int8)
        d29s = d30s = 0
        for w in range(len(bits) // 30):
            word = bits[30 * w:30 * (w + 1)]
            ok, _ = lnav.check_word(word, d29s, d30s)
            assert ok, w
            d29s, d30s = int(word[28]), int(word[29])

    def test_tow_increments_by_frame(self):
        b0 = lnav.encode_frame(EPH, 0)
        _, t0 = lnav.decode_frame(b0)
        b1 = lnav.encode_frame(EPH, 30, int(b0[-2]), int(b0[-1]))
        _, t1 = lnav.decode_frame(b1, int(b0[-2]), int(b0[-1]))
        assert t0 == 0 and t1 == 30
