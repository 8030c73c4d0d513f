"""GLONASS chain test: FDMA synth → acquisition → tracking → string decode
→ RK4 orbit, against a geometric scene.

Covers the pieces no other e2e exercises: frequency-channel acquisition
grids, shared m-sequence code, bi-binary/meander nav with time marks, the
(85,8) Hamming check, state-vector ephemerides and the RK4 integrator."""

import numpy as np
import pytest

from cusdr_tpu import get_config
from cusdr_tpu.constants import SPEED_OF_LIGHT
from cusdr_tpu.geodesy.transforms import e_r_corr, geo2cart, topocent
from cusdr_tpu.io.synth import SynthSV, quantize_iq_int8, synthesize_if
from cusdr_tpu.nav import glonass_nav
from cusdr_tpu.nav.dispatch import decode_channel
from cusdr_tpu.acquisition import acquire
from cusdr_tpu.orbits.glonass import sat_pos_glonass
from cusdr_tpu.signals.defs import get_signal
from cusdr_tpu.tracking import track


def _glo_eph(k: int, t_b: float) -> dict:
    """State-vector ephemeris on a circular ~25500 km orbit (64.8 deg)."""
    rng = np.random.default_rng(100 + k)
    r = 25_508.0                      # km
    inc = np.radians(64.8)
    raan = rng.uniform(0, 2 * np.pi)
    u = rng.uniform(0, 2 * np.pi)
    # position in ECEF-ish frame
    p = np.asarray([
        np.cos(u) * np.cos(raan) - np.sin(u) * np.cos(inc) * np.sin(raan),
        np.cos(u) * np.sin(raan) + np.sin(u) * np.cos(inc) * np.cos(raan),
        np.sin(u) * np.sin(inc)]) * r
    v_mag = 3.9                       # km/s
    t_hat = np.asarray([
        -np.sin(u) * np.cos(raan) - np.cos(u) * np.cos(inc) * np.sin(raan),
        -np.sin(u) * np.sin(raan) + np.cos(u) * np.cos(inc) * np.cos(raan),
        np.cos(u) * np.sin(inc)])
    v = v_mag * t_hat
    return dict(t_b=t_b, tb=t_b,
                x=p[0], y=p[1], z=p[2], vx=v[0], vy=v[1], vz=v[2],
                ax=0.0, ay=0.0, az=0.0,
                xDis=p[0], yDis=p[1], zDis=p[2],
                xVel=v[0], yVel=v[1], zVel=v[2],
                xAcc=0.0, yAcc=0.0, zAcc=0.0,
                tau_n=69793 * 2.0 ** -30, gam=512 * 2.0 ** -40,
                gamma=512 * 2.0 ** -40, dtau=0.0,
                health=0, E=2, N_A=803, tau_c=0.0,
                TOD=0.0)


@pytest.fixture(scope="module", params=["glo_l1", "glo_l2"])
def chain(request):
    """Parametrized over BOTH FDMA receivers: GL1 (562.5 kHz spacing)
    and GL2 (437.5 kHz, GLO/GLO_GL2/initSettings.m:73) — same shared
    m-sequence and nav stack, different carrier plan, so the full
    tracked-IF chain runs once per frequency plan."""
    cfg = get_config(request.param, sampling_freq=4.096e6, if_freq=7000.0,
                     acq_satellite_list=tuple(range(-3, 4)),
                     acq_search_band=2000.0, acq_search_step=250.0,
                     acq_non_coh_time=8, use_trop_corr=False)
    sig = get_signal(request.param)
    # (band is widened after the geometric Doppler is known below)
    tod0 = 41220.0 + 2.0              # receiver time-of-day at sample 0
    rx = np.asarray(geo2cart(40.0, -105.26, 1610.0, 5))

    k = 2                             # frequency channel
    eph = _glo_eph(k, t_b=40500.0)   # multiple of 900 s (tb field LSB)

    def satpos(t, e):
        return sat_pos_glonass(t, e, tau_c=0.0)

    # Sagnac-consistent delay/Doppler at 3 epochs
    ts = np.asarray([0.0, 18.0, 36.0])
    g = np.empty(3)
    # frames are 30 s and aligned: string 1 starts at tk multiples of 30
    frame_t0 = 30.0 * np.floor(tod0 / 30.0) - 30.0
    for i, dt in enumerate(ts):
        tau, clk = 0.075, 0.0
        for _ in range(5):
            pos, clk = satpos(tod0 + dt - tau, eph)
            tau = np.linalg.norm(e_r_corr(tau, pos) - rx) / SPEED_OF_LIGHT
        g[i] = dt + (tod0 - frame_t0) - tau + clk
    g2 = (g[0] - 2 * g[1] + g[2]) / (2 * 18.0 ** 2)
    g1 = (g[2] - g[0]) / 36.0 - g2 * 36.0
    fc = sig.carrier_freq_hz + k * sig.fdma_spacing_hz

    # nav: strings 1..15 repeating; TOD in string 1 = frame start time
    # (string i starts at frame_t0 + 2(i-1))
    strings = []
    for rep in range(40):
        sid = 1 + (rep % 15)
        e = dict(eph)
        if sid == 1:
            e["TOD"] = frame_t0 + 30.0 * (rep // 15)
        strings.append(glonass_nav.encode_string(sid, e))
    sym10 = glonass_nav.encode_symbol_stream(strings)
    doppler = float((g1 - 1.0) * fc)
    # fabricated rotating-frame orbits can have multi-km/s LOS rates;
    # size the search band to cover it (the engine handles any band)
    band = max(2000.0, abs(doppler) + 1000.0)
    step = 250.0 if band < 4000 else 500.0
    cfg = cfg.replace(acq_search_band=band, acq_search_step=step)
    sv = SynthSV(prn=k, fdma_channel=k,
                 code_phase=float(-g[0] * cfg.sampling_freq / g1),
                 doppler_hz=doppler,
                 doppler_rate=float(2.0 * g2 * fc),
                 cn0_dbhz=48.0,
                 nav_bits=sym10)
    samples = synthesize_if(cfg, sig, [sv], num_ms=40_000, seed=13)
    acq = acquire(cfg, sig, samples)
    iq = quantize_iq_int8(samples)
    i = list(acq.prns).index(k)
    chans = [(k, float(acq.carr_freq[i]), int(acq.code_phase[i]))]
    trk = track(cfg, sig, iq, chans, n_epochs=39_000)
    return cfg, sig, sv, eph, acq, trk, frame_t0, satpos, rx, tod0


def test_fdma_acquisition(chain):
    cfg, sig, sv, eph, acq, trk, frame_t0, satpos, rx, tod0 = chain
    i = list(acq.prns).index(2)
    assert acq.detected[i]
    # no detection on other frequency channels
    others = [j for j, p in enumerate(acq.prns) if p != 2]
    assert not any(acq.detected[j] for j in others)


def test_tracking_locks(chain):
    cfg, sig, sv, eph, acq, trk, frame_t0, satpos, rx, tod0 = chain
    ip = np.abs(trk.i_p[0, -5000:]).mean()
    qp = np.abs(trk.q_p[0, -5000:]).mean()
    assert ip > 3 * qp


def test_string_decode_through_pipeline(chain):
    cfg, sig, sv, eph, acq, trk, frame_t0, satpos, rx, tod0 = chain
    dec, start, tod = decode_channel(trk, 0, cfg, sig)
    assert dec is not None
    assert glonass_nav.has_ephemeris(dec)
    for k_ in ("x", "y", "z", "vx", "vy", "vz", "tau_n", "t_b"):
        assert dec[k_] == pytest.approx(eph[k_], rel=1e-4, abs=1e-9), k_
    # decoded TOD refers to the first decoded string start; the stream
    # enters mid-frame so it is frame-aligned modulo 2 s strings
    assert np.isfinite(tod)
    assert (tod - frame_t0) % 2.0 == pytest.approx(0.0, abs=1e-9)
    assert frame_t0 <= tod <= frame_t0 + 40.0


def test_rk4_orbit_against_truth(chain):
    """RK4 integration from t_b must land on the synthesized geometry."""
    cfg, sig, sv, eph, acq, trk, frame_t0, satpos, rx, tod0 = chain
    pos, clk = satpos(tod0, eph)
    assert 2.45e7 < np.linalg.norm(pos) < 2.65e7
    _, elev, _ = topocent(rx, pos - rx)
    assert elev > -5.0   # geometry was not constrained to visibility
