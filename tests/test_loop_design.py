"""Loop-filter design validation.

The reference's 2nd-order loop (Common/calcLoopCoef.m gains applied by the
discrete update of GPS/GPS_L1CA/include/tracking.m:308-317) is linearly
UNSTABLE at the GPS L2C preset operating point (PLL 10 Hz x 20 ms, BL*T =
0.2, GPS/GPS_L2C/initSettings.m): its closed-loop poles leave the unit
circle.  The pole-placement redesign (loop_filters.calc_loop_coef_exact)
is stable at any BL*T and converges to the same gains as T -> 0.
"""

import numpy as np

from cusdr_tpu.tracking.loop_filters import (calc_loop_coef,
                                             calc_loop_coef_exact)

ZETA = 0.7
K_PLL = 0.25   # loop gain the reference folds into tau1 (calcLoopCoef.m)


def closed_loop_poles(tau1, tau2, pdi):
    """Poles of the engine's discrete loop:

        nco_k = nco_{k-1} + a*(e_k - e_{k-1}) + b*e_k
        e_{k+1} = e_k - pdi*nco_k      (integrator plant, 1-epoch delay)

    with a = tau2/tau1, b = pdi/tau1 — characteristic polynomial
    z^2 + (pdi*(a + b) - 2) z + (1 - pdi*a).
    """
    a = tau2 / tau1
    b = pdi / tau1
    return np.roots([1.0, pdi * (a + b) - 2.0, 1.0 - pdi * a])


def loop_sim(tau1, tau2, pdi, n=400):
    """Simulate the linearized loop from a 1-rad initial phase error."""
    a, b = tau2 / tau1, pdi / tau1
    e_prev, nco, e = 0.0, 0.0, 1.0
    errs = []
    for _ in range(n):
        nco = nco + a * (e - e_prev) + b * e
        e_prev = e
        e = e - pdi * nco
        errs.append(e)
    return np.asarray(errs)


def test_reference_design_unstable_at_l2c_preset():
    """BL*T = 0.2 (10 Hz x 20 ms): calcLoopCoef poles outside the unit
    circle — the reference preset is unstable AS SHIPPED."""
    tau1, tau2 = calc_loop_coef(10.0, ZETA, K_PLL)
    poles = closed_loop_poles(tau1, tau2, 0.020)
    assert np.abs(poles).max() > 1.0
    errs = loop_sim(tau1, tau2, 0.020)
    assert np.abs(errs[-50:]).max() > np.abs(errs[:50]).max()


def test_reference_design_stable_at_l1ca_preset():
    """BL*T = 0.02 (20 Hz x 1 ms): the reference design is fine there."""
    tau1, tau2 = calc_loop_coef(20.0, ZETA, K_PLL)
    poles = closed_loop_poles(tau1, tau2, 0.001)
    assert np.abs(poles).max() < 1.0


def test_exact_design_stable_at_any_blt():
    for lbw, pdi in [(10.0, 0.020), (25.0, 0.020), (20.0, 0.004),
                     (15.0, 0.010), (50.0, 0.020)]:
        tau1, tau2 = calc_loop_coef_exact(lbw, ZETA, K_PLL, pdi)
        poles = closed_loop_poles(tau1, tau2, pdi)
        assert np.abs(poles).max() < 1.0, (lbw, pdi, poles)
        errs = loop_sim(tau1, tau2, pdi)
        assert np.abs(errs[-20:]).max() < 1e-3, (lbw, pdi)


def test_exact_converges_to_reference_as_t_to_zero():
    t1r, t2r = calc_loop_coef(15.0, ZETA, K_PLL)
    for pdi, tol in [(1e-3, 0.1), (1e-4, 0.01), (1e-5, 0.001)]:
        t1e, t2e = calc_loop_coef_exact(15.0, ZETA, K_PLL, pdi)
        assert abs(t1e - t1r) / t1r < tol
        assert abs(t2e - t2r) / t2r < tol


def test_exact_poles_match_analog_prototype():
    """The discrete poles sit at exp(s*T) of the effective analog
    prototype (w_eff = Wn/sqrt(k), zeta_eff = zeta/sqrt(k))."""
    lbw, pdi = 10.0, 0.020
    tau1, tau2 = calc_loop_coef_exact(lbw, ZETA, K_PLL, pdi)
    wn = lbw * 8.0 * ZETA / (4.0 * ZETA ** 2 + 1.0)
    sk = np.sqrt(K_PLL)
    we, ze = wn / sk, ZETA / sk
    disc = np.sqrt(complex(ze * ze - 1.0))
    expect = sorted(np.exp(np.array([(-ze + disc), (-ze - disc)])
                           * we * pdi), key=lambda z: z.imag)
    got = sorted(closed_loop_poles(tau1, tau2, pdi),
                 key=lambda z: np.imag(z))
    np.testing.assert_allclose(np.asarray(got, complex),
                               np.asarray(expect, complex), atol=1e-9)
