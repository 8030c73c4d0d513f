"""Geodesy / orbits / PVT unit tests."""

import numpy as np
import pytest

from cusdr_tpu.constants import SPEED_OF_LIGHT
from cusdr_tpu.geodesy import (cart2geo, cart2utm, check_t, e_r_corr,
                               find_utm_zone, geo2cart, togeod, topocent,
                               tropo)
from cusdr_tpu.io.scenario import make_gps_eph
from cusdr_tpu.orbits.kepler import sat_pos_kepler
from cusdr_tpu.pvt.lsq import least_square_pos


class TestTransforms:
    def test_geo_cart_roundtrip(self):
        for lat, lon, h in [(40.0, -105.26, 1610.0), (-33.9, 151.2, 50.0),
                            (0.0, 0.0, 0.0), (71.0, 8.0, 10.0)]:
            x, y, z = geo2cart(lat, lon, h, 5)
            lat2, lon2, h2 = cart2geo(x, y, z, 5)
            assert lat2 == pytest.approx(lat, abs=1e-8)
            assert lon2 == pytest.approx(lon, abs=1e-8)
            assert h2 == pytest.approx(h, abs=1e-3)

    def test_togeod_matches_cart2geo(self):
        x, y, z = geo2cart(40.0, -105.26, 1610.0, 5)
        phi, lam, h = togeod(6378137.0, 298.257223563, x, y, z)
        assert phi == pytest.approx(40.0, abs=1e-7)
        assert lam == pytest.approx(360.0 - 105.26, abs=1e-7)
        assert h == pytest.approx(1610.0, abs=1e-2)

    def test_topocent_zenith(self):
        x = np.asarray(geo2cart(40.0, -105.0, 0.0, 5))
        up = x / np.linalg.norm(x)
        az, el, d = topocent(x, up * 1000.0)
        assert el == pytest.approx(90.0, abs=0.2)
        assert d == pytest.approx(1000.0)

    def test_check_t_half_week(self):
        assert check_t(302401.0) == 302401.0 - 604800.0
        assert check_t(-302401.0) == -302401.0 + 604800.0
        assert check_t(1000.0) == 1000.0

    def test_e_r_corr_rotates(self):
        x = np.asarray([2e7, 0.0, 1e7])
        x2 = e_r_corr(0.075, x)
        # rotation by ~ωτ ≈ 5.5e-6 rad → ~110 m displacement at 2e7 m
        assert np.linalg.norm(x2 - x) == pytest.approx(
            2e7 * 7.292115147e-5 * 0.075, rel=1e-3)
        assert x2[2] == x[2]

    def test_utm_zone(self):
        assert find_utm_zone(40.0, -105.26) == 13
        # Norway exception (findUtmZone.m)
        assert find_utm_zone(60.0, 5.0) == 32
        with pytest.raises(ValueError):
            find_utm_zone(85.0, 0.0)

    def test_cart2utm_sane(self):
        x, y, z = geo2cart(40.0, -105.26, 1610.0, 5)
        E, N, U = cart2utm(x, y, z, 13)
        # Boulder CO: easting ~478 km, northing ~4429 km
        assert 3e5 < E < 7e5
        assert 4.3e6 < N < 4.5e6
        # U is height above the ED50/International ellipsoid used by
        # cart2utm.m (datum offset vs WGS-84 is ~230 m here)
        assert U == pytest.approx(1610.0, abs=300.0)


class TestTropo:
    def test_goad_goodman_values(self):
        # zenith delay ~2.4 m; grows steeply at low elevation
        z = tropo(1.0, 0.0, 1013.0, 293.0, 50.0, 0.0, 0.0, 0.0)
        assert 2.0 < z < 3.0
        low = tropo(np.sin(np.radians(5.0)), 0.0, 1013.0, 293.0, 50.0,
                    0.0, 0.0, 0.0)
        assert 20.0 < low < 30.0


class TestKepler:
    def test_orbit_radius_and_period(self):
        eph = make_gps_eph(1, 350000.0, m0=1.0, omega0=2.0)
        pos, clk = sat_pos_kepler(350000.0, eph)
        r = np.linalg.norm(pos)
        # GPS semi-major axis ~26560 km, |e| < 0.02
        assert 2.55e7 < r < 2.75e7
        assert abs(clk) < 1e-3
        # half an orbital period later the satellite is roughly antipodal
        period = 2 * np.pi * np.sqrt((eph["sqrtA"] ** 2) ** 3 / 3.986005e14)
        pos2, _ = sat_pos_kepler(350000.0 + period / 2, eph)
        # compare in inertial-ish sense: radius stays near-circular
        assert 2.5e7 < np.linalg.norm(pos2) < 2.8e7

    def test_clock_includes_af0(self):
        eph = make_gps_eph(2, 350000.0, m0=0.5, omega0=1.0)
        _, clk = sat_pos_kepler(350000.0, eph)
        assert clk == pytest.approx(eph["a_f0"], abs=5e-6)


class TestLSQ:
    def test_recovers_position_noise_free(self):
        rng = np.random.default_rng(3)
        rx = np.asarray(geo2cart(40.0, -105.26, 1610.0, 5))
        clock_bias_m = 2500.0
        sats = []
        for k in range(64):
            eph = make_gps_eph((k % 32) + 1, 350000.0,
                               m0=float(rng.uniform(0, 6)),
                               omega0=float(rng.uniform(0, 6)))
            pos, _ = sat_pos_kepler(350000.0, eph)
            _, el, _ = topocent(rx, pos - rx)
            if el > 10:
                sats.append(pos)
            if len(sats) >= 8:
                break
        assert len(sats) >= 4
        sat_pos = np.stack(sats, axis=1)
        # observations consistent with solver physics (earth rotation)
        obs = []
        for i in range(sat_pos.shape[1]):
            tau = np.linalg.norm(sat_pos[:, i] - rx) / SPEED_OF_LIGHT
            for _ in range(3):
                rot = e_r_corr(tau, sat_pos[:, i])
                tau = np.linalg.norm(rot - rx) / SPEED_OF_LIGHT
            obs.append(tau * SPEED_OF_LIGHT + clock_bias_m)
        pos, el, az, dop = least_square_pos(sat_pos, np.asarray(obs),
                                            use_trop_corr=False)
        assert np.linalg.norm(pos[:3] - rx) < 0.5
        assert pos[3] == pytest.approx(clock_bias_m, abs=0.5)
        assert np.all(np.isfinite(dop))

    def test_rank_deficient_returns_inf_dop(self):
        sat_pos = np.tile(np.asarray([[2.6e7], [0.0], [0.0]]), (1, 4))
        pos, el, az, dop = least_square_pos(sat_pos,
                                            np.full(4, 2.2e7), False)
        assert np.all(np.isinf(dop))
