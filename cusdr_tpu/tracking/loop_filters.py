"""Tracking-loop filter design.

calc_loop_coef: 2nd-order loop constants τ1, τ2 from noise bandwidth and
damping (GPS/GPS_L1CA/Common/calcLoopCoef.m:41-45).

calc_loop_coef_carr3: 3rd-order carrier-loop gains pf1/pf2/pf3 used by
B1C/E5b-style receivers (Common/calcLoopCoefCarr.m, survey §2.2).

calc_loop_coef_exact: pole-placement digital redesign of the same loop.
The reference's discrete update (tracking.m:308-317)

    nco_k = nco_{k-1} + (tau2/tau1)(e_k - e_{k-1}) + e_k*(T/tau1)

applied with one epoch of delay has closed-loop characteristic
``z^2 + (T*a + T*b - 2) z + (1 - T*a)`` (a = tau2/tau1, b = T/tau1 per
unit T), which leaves the unit circle for BL*T >~ 0.17 — the GPS L2C
preset (PLL 10 Hz x 20 ms, BL*T = 0.2) is linearly unstable AS SHIPPED in
the reference (GPS/GPS_L2C/initSettings.m).  The exact design places the
discrete poles at exp(s*T) of the effective analog prototype
(w_eff = Wn/sqrt(k), zeta_eff = zeta/sqrt(k) — the reference folds the
assumed plant gain k into tau1), so the loop is stable at any BL*T and
the gains converge to calcLoopCoef's as T -> 0.
"""

from __future__ import annotations

import numpy as np


def calc_loop_coef(lbw: float, zeta: float, k: float):
    """Return (tau1, tau2) for a 2nd-order loop filter.

    Wn = LBW·8ζ/(4ζ²+1);  τ1 = k/Wn²;  τ2 = 2ζ/Wn
    (calcLoopCoef.m:41-45).
    """
    wn = lbw * 8.0 * zeta / (4.0 * zeta * zeta + 1.0)
    tau1 = k / (wn * wn)
    tau2 = 2.0 * zeta / wn
    return tau1, tau2


def calc_loop_coef_exact(lbw: float, zeta: float, k: float, pdi: float):
    """Return (tau1, tau2) placing the discrete closed-loop poles at
    exp(s*T) of the effective analog prototype (module docstring).

    Matching z^2 + (T*a + T*b - 2) z + (1 - T*a) = (z - z1)(z - z2)
    gives a = (1 - z1*z2)/T and b = (2 - z1 - z2)/T - a; the engine's
    gains are a = tau2/tau1 and b = pdi/tau1.
    """
    wn = lbw * 8.0 * zeta / (4.0 * zeta * zeta + 1.0)
    sk = np.sqrt(k)
    we, ze = wn / sk, zeta / sk
    disc = np.sqrt(complex(ze * ze - 1.0))
    s1 = (-ze + disc) * we
    s2 = (-ze - disc) * we
    z1, z2 = np.exp(s1 * pdi), np.exp(s2 * pdi)
    tr = float((z1 + z2).real)
    det = float((z1 * z2).real)
    a = (1.0 - det) / pdi
    b = (2.0 - tr) / pdi - a
    tau1 = pdi / b
    tau2 = a * tau1
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
