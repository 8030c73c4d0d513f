"""Nav-message codec tests: FEC primitives and full encode/decode
round-trips for CNAV, I/NAV, F/NAV, GLONASS strings, BDS D1 and B-CNAV1/2.

Each codec's encoder quantizes fields to their ICD LSBs, so round-trip
comparisons use LSB-aware tolerances.
"""

import numpy as np
import pytest

from cusdr_tpu.nav import bcnav, bds_d1, cnav, fec, glonass_nav
from cusdr_tpu.nav import galileo_nav as gal


class TestFEC:
    def test_conv_impulse_response_171_133(self):
        imp = fec.conv_encode(np.asarray([1, 0, 0, 0, 0, 0, 0], np.uint8),
                              tail=False).reshape(-1, 2)
        assert "".join(map(str, imp[:, 0])) == "1111001"   # 171 octal
        assert "".join(map(str, imp[:, 1])) == "1011011"   # 133 octal

    def test_viterbi_corrects_noise(self):
        rng = np.random.default_rng(0)
        bits = rng.integers(0, 2, 300).astype(np.uint8)
        sym = 1.0 - 2.0 * fec.conv_encode(bits)
        noisy = sym + rng.normal(0, 0.6, len(sym))
        assert np.array_equal(fec.viterbi_decode(noisy, 300), bits)

    def test_crc24q_vector(self):
        # CRC-24Q (poly 0x864CFB, init 0): check value for "123456789"
        data = np.unpackbits(np.frombuffer(b"123456789", np.uint8))
        assert fec.crc24q(data) == 0xCDE703

    def test_crc24q_detects_errors(self):
        rng = np.random.default_rng(1)
        msg = fec.crc24q_append(rng.integers(0, 2, 276).astype(np.uint8))
        assert fec.crc24q_check(msg)
        for k in (0, 100, 299):
            bad = msg.copy()
            bad[k] ^= 1
            assert not fec.crc24q_check(bad)

    def test_bch_ml_decode(self):
        rng = np.random.default_rng(2)
        for cb, n in ((fec.bch_codebook_21_6(), 21),
                      (fec.bch_codebook_51_8(), 51)):
            for m in (0, 5, len(cb) - 1):
                soft = 1.0 - 2.0 * cb[m] + rng.normal(0, 0.4, n)
                assert fec.bch_ml_decode(soft, cb) == m

    def test_glonass_hamming(self):
        rng = np.random.default_rng(3)
        eph = dict(TOD=41220, tb=11700)
        s = glonass_nav.encode_string(1, eph)
        assert fec.glonass_hamming_check(s)
        bad = s.copy()
        bad[40] ^= 1     # data-bit error -> reject
        assert not fec.glonass_hamming_check(bad)

    def test_bch15(self):
        for d in (0, 1, 0x7FF, 0x2AB):
            cw = bds_d1.bch15_encode(d)
            for e in [None] + list(range(15)):
                w = cw if e is None else cw ^ (1 << e)
                out, ok = bds_d1.bch15_decode(w)
                assert ok and out == d


CNAV_EPH = dict(weekNumber=1214.0, health=0.0, T_op=345600.0, URA_ED=1.0,
                t_oe=345600.0, deltaA=-123.5, ADot=0.001,
                delta_n_0=4.25e-09, delta_n_0Dot=1e-14, M_0=1.19731,
                e=0.0096785, omega=0.97187, omega_0=2.46209, i_0=0.98,
                delta_omegaDot=-1e-9, i_0Dot=-4.9e-10, C_is=1.32e-07,
                C_ic=-9.87e-08, C_rs=-115.4, C_rc=255.34, C_us=5.12e-06,
                C_uc=-6.03e-06, t_oc=345600.0, a_f0=-4.69e-04,
                a_f1=-3.18e-12, a_f2=0.0, T_GD=5.1e-09, ISC_L2C=1e-9)

KEYS = ("M_0", "e", "omega", "omega_0", "i_0", "t_oe", "a_f0", "t_oc")


def close(dec, eph, keys=KEYS, rel=1e-6):
    return [k for k in keys
            if abs(dec.get(k, 1e9) - eph[k]) > abs(eph[k]) * rel + 1e-9]


class TestCNAV:
    def test_stream_roundtrip(self):
        msgs = [cnav.encode_message(mid, CNAV_EPH, 345600 + 12 * (i + 1),
                                    prn=7)
                for i, mid in enumerate([10, 11, 30])]
        sym = cnav.encode_symbol_stream(msgs).astype(np.float64)
        eph, first, tow = cnav.decode_stream(sym)
        assert first == 0
        assert tow == 345600
        assert cnav.has_ephemeris(eph)
        assert not close(eph, CNAV_EPH)

    def test_g2_phase_ambiguity(self):
        msgs = [cnav.encode_message(10, CNAV_EPH, 345612, prn=7)] * 2
        sym = cnav.encode_symbol_stream(msgs).astype(np.float64)
        eph, first, tow = cnav.decode_stream(sym[1:])   # off-phase start
        assert 10 in eph.get("idValid", set())


class TestGalileo:
    EPH = dict(CNAV_EPH, IODnav1=57, IODnav2=57, IODnav3=57, IODnav4=57,
               sqrtA=5440.6, OmegaDot=-8.08e-09, Omega_0=2.46209,
               deltan=4.25e-09, CUC=-6.03e-06, CUS=5.12e-06, CRC=255.34,
               CRS=-115.4, CIC=-9.87e-08, CIS=1.32e-07, SVID=4,
               iDot=-4.9e-10, t_oe=345600 // 60 * 60,
               t_oc=345600 // 60 * 60, a_i0=30.0, a_i1=0.1, a_i2=0.001,
               BGD_E1E5a=2e-9, BGD_E1E5b=3e-9, E5b_HS=0, E1b_HS=0,
               E5a_HS=0, WN=120)
    GKEYS = ("M_0", "e", "sqrtA", "Omega_0", "i_0", "omega", "t_oe",
             "a_f0")

    def test_inav_roundtrip(self):
        tow0 = 123456
        syms = [gal.inav_encode_page_pair(
            gal.inav_word(wt, self.EPH, tow_raw=tow0 + 2 * i))
            for i, wt in enumerate([1, 2, 3, 4, 5])]
        stream = 1 - 2 * np.concatenate(syms).astype(np.float64)
        dec, first, tow = gal.inav_decode_symbol_stream(stream)
        assert first == 0 and tow == tow0
        assert gal.inav_has_ephemeris(dec)
        assert not close(dec, self.EPH, self.GKEYS)

    def test_fnav_roundtrip(self):
        tow0 = 123450
        syms = [gal.fnav_encode_page(pt, self.EPH, tow_raw=tow0 + 10 * i)
                for i, pt in enumerate([1, 2, 3, 4])]
        stream = 1 - 2 * np.concatenate(syms).astype(np.float64)
        dec, first, tow = gal.fnav_decode_symbol_stream(stream)
        assert first == 0 and tow == tow0
        assert gal.fnav_has_ephemeris(dec)
        assert not close(dec, self.EPH, self.GKEYS)


class TestGlonass:
    # field values chosen on their ICD LSB grids (2^-11 km, 2^-20 km/s,
    # 2^-30 km/s^2, 2^-40, 2^-30 s, 2^-31 s)
    EPH = dict(xDis=23008324 * 2.0 ** -11, yDis=-43487486 * 2.0 ** -11,
               zDis=20227183 * 2.0 ** -11,
               xVel=1294467 * 2.0 ** -20, yVel=-2459704 * 2.0 ** -20,
               zVel=595427 * 2.0 ** -20,
               xAcc=2.0 ** -30, yAcc=-2 * 2.0 ** -30, zAcc=3 * 2.0 ** -30,
               gam=512 * 2.0 ** -40, tau_n=69793 * 2.0 ** -30,
               dtau=2 * 2.0 ** -30, tb=11700, TOD=41220,
               health=0, E=2, N_A=803, tau_c=-101 * 2.0 ** -31)

    def test_string_roundtrip(self):
        strings = [glonass_nav.encode_string(1 + (i % 15), self.EPH)
                   for i in range(15)]
        stream = glonass_nav.encode_symbol_stream(strings)
        i_p = np.kron(stream.astype(np.float64), np.ones(10)) * 1000
        i_p = np.concatenate([np.full(500, -800.0), i_p])
        dec, start, tod = glonass_nav.decode_prompt_stream(i_p)
        assert start == 800
        assert tod == self.EPH["TOD"]
        assert glonass_nav.has_ephemeris(dec)
        for k in ("xDis", "yVel", "zAcc", "gam", "tau_n", "tb"):
            assert dec[k] == pytest.approx(self.EPH[k], rel=1e-4,
                                           abs=1e-12)

    def test_polarity_invariance(self):
        strings = [glonass_nav.encode_string(1 + i, self.EPH)
                   for i in range(15)]
        stream = glonass_nav.encode_symbol_stream(strings)
        i_p = np.kron(stream.astype(np.float64), np.ones(10))
        dec, start, _ = glonass_nav.decode_prompt_stream(-i_p)
        assert glonass_nav.has_ephemeris(dec)


class TestBdsD1:
    EPH = dict(SatH1=0, IODC=12, URAI=0, WN=810, t_oc=345600.0,
               T_GD_1=1.2e-9, alpha0=1e-8, alpha1=-2e-8, alpha2=3e-7,
               alpha3=-1e-7, beta0=128000.0, beta1=-32768.0,
               beta2=131072.0, beta3=-65536.0, a2=0.0, a0=-4.69e-04,
               a1=-3.18e-12, IODE=12, deltan=4.25e-09, C_uc=-6.03e-06,
               M_0=1.19731, e=0.0096785, C_us=5.12e-06, C_rc=255.34375,
               C_rs=-115.40625, sqrtA=6493.45, i_0=0.98, C_ic=-9.87e-08,
               omegaDot=-8.08e-09, C_is=1.32e-07, iDot=-4.9e-10,
               omega_0=2.46209, omega=0.97187)

    def test_frame_roundtrip(self):
        eph = dict(self.EPH)
        toe_raw = int(345600 / 8)
        eph["t_oe_msb"] = toe_raw >> 15
        eph["t_oe_lsb"] = toe_raw & 0x7FFF
        sow0 = 345600
        bits = np.concatenate([
            bds_d1.encode_subframe(i + 1, eph, sow0 + 6 * i)
            for i in range(5)])
        dec, sow = bds_d1.decode_frame(bits)
        assert sow == sow0
        assert bds_d1.has_ephemeris(dec)
        assert dec["t_oe"] == 345600.0
        assert not close(dec, self.EPH,
                         ("M_0", "e", "sqrtA", "omega_0", "i_0", "omega",
                          "a0", "t_oc"))

    def test_bch_error_corrected(self):
        eph = dict(self.EPH, t_oe_msb=0, t_oe_lsb=0)
        bits = bds_d1.encode_subframe(1, eph, 345600)
        bits = np.concatenate([bits] +
                              [bds_d1.encode_subframe(i + 2, eph,
                                                      345606 + 6 * i)
                               for i in range(4)])
        bits[40] ^= 1    # single interleaved-word error
        dec, sow = bds_d1.decode_frame(bits)
        assert sow == 345600


class TestBcnav:
    EPH = dict(CNAV_EPH, WN=810, HOW=100, IODC=0, IODE=0, SatType=3,
               T_GDB2ap=1e-9, ISC_B1Cd=2e-9, T_GDB1Cp=3e-9, ISC_B2ad=1e-9)

    def test_bcnav1_roundtrip(self):
        frame = bcnav.bcnav1_encode_frame(19, 100, self.EPH)
        sym = 1.0 - 2.0 * frame.astype(np.float64)
        dec = {}
        ok, prn, soh = bcnav.bcnav1_decode_frame(sym, dec)
        assert ok and prn == 19 and soh == 1800
        assert bcnav.bcnav1_has_ephemeris(dec)
        assert not close(dec, self.EPH)

    def test_bcnav1_polarity(self):
        frame = bcnav.bcnav1_encode_frame(19, 5, self.EPH)
        dec = {}
        ok, _, _ = bcnav.bcnav1_decode_frame(
            -(1.0 - 2.0 * frame.astype(np.float64)), dec)
        assert ok

    def test_bcnav2_roundtrip(self):
        frames = [bcnav.bcnav2_encode_frame(mid, 19, 345600 + 3 * i,
                                            self.EPH)
                  for i, mid in enumerate([10, 11, 30])]
        stream = 1 - 2 * np.concatenate(frames).astype(np.float64)
        dec, first, sow = bcnav.bcnav2_decode_symbol_stream(stream)
        assert first == 0 and sow == 345600
        assert bcnav.bcnav2_has_ephemeris(dec)
        assert not close(dec, self.EPH)
