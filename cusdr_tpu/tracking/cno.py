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
