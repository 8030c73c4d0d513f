"""Tracking-loop filter design.

calc_loop_coef: 2nd-order loop constants τ1, τ2 from noise bandwidth and
damping (GPS/GPS_L1CA/Common/calcLoopCoef.m:41-45).

calc_loop_coef_carr3: 3rd-order carrier-loop gains pf1/pf2/pf3 used by
B1C/E5b-style receivers (Common/calcLoopCoefCarr.m, survey §2.2).
"""

from __future__ import annotations


def calc_loop_coef(lbw: float, zeta: float, k: float):
    """Return (tau1, tau2) for a 2nd-order loop filter.

    Wn = LBW·8ζ/(4ζ²+1);  τ1 = k/Wn²;  τ2 = 2ζ/Wn
    (calcLoopCoef.m:41-45).
    """
    wn = lbw * 8.0 * zeta / (4.0 * zeta * zeta + 1.0)
    tau1 = k / (wn * wn)
    tau2 = 2.0 * zeta / wn
    return tau1, tau2


def calc_loop_coef_carr3(lbw: float, integration_time: float):
    """Return (pf1, pf2, pf3) for a 3rd-order carrier loop.

    Wn = LBW/0.7845; pf3 = Wn³·T²; pf2 = 1.1·Wn²·T; pf1 = 2.4·Wn
    (Common/calcLoopCoefCarr.m of the B1C/E1C/E5 receivers).
    """
    wn = lbw / 0.7845
    t = integration_time
    pf3 = wn ** 3 * t * t
    pf2 = 1.1 * wn * wn * t
    pf1 = 2.4 * wn
    return pf1, pf2, pf3
