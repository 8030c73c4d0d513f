"""Carrier-to-noise-density estimators.

cno_vsm: variance summing method (GPS/GPS_L1CA/Common/CNoVSM.m:43-47).
cno_nwpr: narrowband/wideband power ratio method used by GLONASS
(GLO/GLO_GL1/include/CNoPRM.m:42-60).
"""

from __future__ import annotations

import numpy as np


def cno_vsm(i_p: np.ndarray, q_p: np.ndarray, acc_time_s: float) -> float:
    """VSM C/N0 over one accumulation interval of prompt correlators."""
    z = i_p.astype(np.float64) ** 2 + q_p.astype(np.float64) ** 2
    zm = z.mean()
    zv = z.var(ddof=1)
    pav = np.sqrt(np.maximum(zm * zm - zv, 0.0))
    nv = 0.5 * (zm - pav)
    if nv <= 0 or pav <= 0:
        return 0.0
    return float(10.0 * np.log10((1.0 / acc_time_s) * pav / (2.0 * nv)))


def cno_nwpr(i_p: np.ndarray, q_p: np.ndarray, acc_time_s: float,
             m: int = 20) -> float:
    """NWPR (power-ratio) C/N0: chunks of M prompt samples; wideband power
    sums |z|² per sample, narrowband power |Σz|² per chunk."""
    n = (len(i_p) // m) * m
    i2 = i_p[:n].astype(np.float64).reshape(-1, m)
    q2 = q_p[:n].astype(np.float64).reshape(-1, m)
    wbp = (i2 ** 2 + q2 ** 2).sum(axis=1)
    nbp = i2.sum(axis=1) ** 2 + q2.sum(axis=1) ** 2
    mu = np.mean(nbp / np.maximum(wbp, 1e-30))
    if mu <= 1.0 or mu >= m:
        return 0.0
    return float(10.0 * np.log10((1.0 / acc_time_s) * (mu - 1.0) / (m - mu)))


def pll_lock_detector(i_p: np.ndarray, q_p: np.ndarray) -> float:
    """Narrowband power PLL lock detector NBD/NBP over one accumulation
    interval (BDS/B1C/include/Calc_CNo_PLD.m:14-16).

    Near +1 when phase-locked, near 0/negative when unlocked.
    """
    i_p = np.asarray(i_p, np.float64)
    q_p = np.asarray(q_p, np.float64)
    rect = i_p[i_p > 0].sum() - i_p[i_p < 0].sum()
    nbp = rect ** 2 + q_p.sum() ** 2
    nbd = rect ** 2 - q_p.sum() ** 2
    if nbp == 0:
        return 0.0
    return float(nbd / nbp)


def cno_pld(i_p, q_p, pilot_ip, pilot_qp, acc_time_s: float,
            pilot_flag: int = 1):
    """Data+pilot C/N0 and PLL lock detectors (Calc_CNo_PLD.m).

    pilot_flag 1 swaps the pilot I/Q (the π/2-rotated pilot correlator
    convention); returns (cno_data, cno_pilot, cno_sum, pld_data,
    pld_pilot).
    """
    cno_d = cno_vsm(i_p, q_p, acc_time_s)
    pld_d = pll_lock_detector(i_p, q_p)
    if pilot_flag == 1:
        pi, pq = np.asarray(pilot_qp), np.asarray(pilot_ip)
    else:
        pi, pq = np.asarray(pilot_ip), np.asarray(pilot_qp)
    cno_p = cno_vsm(pi, pq, acc_time_s)
    pld_p = pll_lock_detector(pi, pq)
    lin = 10 ** (cno_d / 10.0) + 10 ** (cno_p / 10.0)
    return cno_d, cno_p, 10.0 * np.log10(max(lin, 1e-12)), pld_d, pld_p
