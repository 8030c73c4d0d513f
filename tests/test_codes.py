"""Spreading-code generator tests.

The reference has no automated tests (SURVEY.md §4); this suite validates our
generators against IS-GPS-200 published first-10-chip octals and structural
code properties (balance, periodic auto/cross-correlation bounds) that any
correct ICD implementation must satisfy.
"""

import numpy as np
import pytest

from cusdr_tpu.signals import codes as C


def first10_octal(code):
    bits = (code[:10] > 0).astype(int)
    return int("".join(map(str, bits)), 2)


def periodic_xcorr(a, b):
    fa = np.fft.fft(a.astype(float))
    fb = np.fft.fft(b.astype(float))
    return np.fft.ifft(fa * np.conj(fb)).real


class TestL1CA:
    # IS-GPS-200 Table 3-Ia: first 10 chips, octal
    ICD_FIRST10 = {1: 0o1440, 2: 0o1620, 3: 0o1710, 4: 0o1744, 5: 0o1133,
                   6: 0o1455, 7: 0o1131, 8: 0o1454, 9: 0o1626, 10: 0o1504}

    @pytest.mark.parametrize("prn,expected", sorted(ICD_FIRST10.items()))
    def test_icd_first10(self, prn, expected):
        assert first10_octal(C.l1ca(prn)) == expected

    def test_gold_properties(self):
        ca1, ca2 = C.l1ca(1), C.l1ca(2)
        assert ca1.shape == (1023,) and set(np.unique(ca1)) <= {-1, 1}
        ac = periodic_xcorr(ca1, ca1)
        assert ac[0] == 1023
        # Gold codes: off-peak autocorrelation in {-65, -1, 63}
        assert set(np.round(ac[1:]).astype(int)) <= {-65, -1, 63}
        cc = periodic_xcorr(ca1, ca2)
        assert set(np.round(cc).astype(int)) <= {-65, -1, 63}

    def test_sbas_prns(self):
        # WAAS PRN 120 -> index 33 (generateCAcode.m:47-50)
        assert C.l1ca(33).shape == (1023,)


class TestGLONASS:
    def test_mseq_autocorrelation(self):
        code = C.glonass_ca()
        assert code.shape == (511,)
        ac = periodic_xcorr(code, code)
        assert ac[0] == 511
        # perfect m-sequence: all off-peak values are exactly -1
        assert np.allclose(ac[1:], -1)


ALL_GENERATORS = [
    ("l2cm", C.l2cm, (1, 32, 63), 10230),
    ("l5i", C.l5i, (1, 32), 10230),
    ("l5q", C.l5q, (1, 32), 10230),
    ("e5ai", C.e5ai, (1, 50), 10230),
    ("e5aq", C.e5aq, (1, 50), 10230),
    ("e5bi", C.e5bi, (1,), 10230),
    ("e5bq", C.e5bq, (1,), 10230),
    ("b1i", C.b1i, (1, 37, 38, 58), 2046),
    ("b3i", C.b3i, (1, 63), 10230),
    ("b2a_data", C.b2a_data, (19, 46), 10230),
    ("b2a_pilot", C.b2a_pilot, (19,), 10230),
    ("b1c_data", C.b1c_data_primary, (1, 63), 10230),
    ("b1c_pilot", C.b1c_pilot_primary, (1, 63), 10230),
    ("e1b", C.e1b_primary, (1, 50), 4092),
    ("e1c", C.e1c_primary, (1, 50), 4092),
]


@pytest.mark.parametrize("name,gen,prns,length", ALL_GENERATORS,
                         ids=[g[0] for g in ALL_GENERATORS])
def test_code_structure(name, gen, prns, length):
    """Every primary code: right length, ±1 chips, sharp periodic
    autocorrelation, low cross-correlation between PRNs."""
    for prn in prns:
        code = gen(prn)
        assert code.shape == (length,)
        assert set(np.unique(code)) <= {-1, 1}
        ac = periodic_xcorr(code, code)
        assert np.isclose(ac[0], length)
        assert np.abs(ac[1:]).max() < 0.25 * length
    if len(prns) > 1:
        cc = periodic_xcorr(gen(prns[0]), gen(prns[1]))
        assert np.abs(cc).max() < 0.25 * length


class TestSecondaryCodes:
    def test_lengths_and_values(self):
        for code, n in [(C.NH20, 20), (C.NH10, 10), (C.NH5, 5),
                        (C.E5AI_SECONDARY, 20), (C.E5BI_SECONDARY, 4),
                        (C.E1C_SECONDARY, 25),
                        (C.e5aq_secondary(1), 100),
                        (C.e5bq_secondary(1), 100),
                        (C.b1c_secondary(1), 1800)]:
            assert len(code) == n
            assert set(np.unique(code)) <= {-1, 1}

    def test_nh20_matches_reference(self):
        # GPS_L5C/include/acquisition.m:152-153
        expected = [1, 1, 1, 1, 1, -1, 1, 1, -1, -1,
                    1, -1, 1, -1, 1, 1, -1, -1, -1, 1]
        assert C.NH20.tolist() == expected

    def test_e5b_cs4(self):
        # GAL_E5b/include/generateE5bIcode.m:117
        assert C.E5BI_SECONDARY.tolist() == [-1, -1, -1, 1]

    def test_b1c_secondary_structure(self):
        s1, s2 = C.b1c_secondary(1), C.b1c_secondary(2)
        assert not np.array_equal(s1, s2)


class TestL2CL:
    def test_rz_interleave(self):
        cm = C.l2cm_rz(1)
        assert cm.shape == (20460,)
        assert np.all(cm[1::2] == 0) and np.all(cm[0::2] != 0)
        cl = C.l2cl_rz(1)
        assert cl.shape == (1534500,)
        assert np.all(cl[0::2] == 0) and np.all(cl[1::2] != 0)


class TestBOCExpansion:
    def test_e1_boc11(self):
        prim = C.e1b_primary(1)
        boc = C.e1b(1)
        assert boc.shape == (8184,)
        # E1 convention: [+c, -c] (generateE1Bcode.m:58-65)
        assert np.array_equal(boc[0::2], prim)
        assert np.array_equal(boc[1::2], -prim)

    def test_b1c_boc11(self):
        prim = C.b1c_pilot_primary(1)
        boc = C.b1c_pilot_boc11(1)
        # B1C convention: [-c, +c] (generatePilotBOC11.m:88-95)
        assert np.array_equal(boc[0::2], -prim)
        assert np.array_equal(boc[1::2], prim)

    def test_b1c_boc61(self):
        prim = C.b1c_pilot_primary(1)
        boc = C.b1c_pilot_boc61(1)
        assert boc.shape == (122760,)
        # chip -> (-1)^i * c for i=1..12 (generatePilotBOC61.m:89-96)
        assert np.array_equal(boc[:12], prim[0] * np.array(
            [-1, 1, -1, 1, -1, 1, -1, 1, -1, 1, -1, 1]))
