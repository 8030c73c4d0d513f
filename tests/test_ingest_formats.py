"""File-format matrix parity: the reference settings expose fileType
(1 = real, 2 = interleaved I/Q) × dataType (schar, int16)
(GPS/GPS_L1CA/initSettings.m:58-73, tracking.m:145-153,212-216).
Verify the receiver acquires and locks from on-disk files in each
format, including the real-sample branch (I + j·0 processing)."""

import numpy as np
import pytest

from cusdr_tpu import get_config
from cusdr_tpu.io.ingest import read_if_file, unpack_2bit_iq
from cusdr_tpu.io.synth import SynthSV, synthesize_if
from cusdr_tpu.receiver import Receiver
from cusdr_tpu.signals.defs import get_signal

PRN = 9


def _scene(cfg, num_ms=400):
    sig = get_signal("gps_l1ca")
    sv = SynthSV(prn=PRN, code_phase=777.0, doppler_hz=1500.0,
                 cn0_dbhz=50)
    return synthesize_if(cfg, sig, [sv], num_ms=num_ms, seed=11)


def _check(res, cfg):
    i = list(res.acq.prns).index(PRN)
    assert res.acq.detected[i]
    err = abs(int(res.acq.code_phase[i]) - 777) \
        % cfg.samples_per_code
    assert min(err, cfg.samples_per_code - err) <= 2
    trk = res.track
    ip = np.abs(trk.i_p[0, -150:]).mean()
    qp = np.abs(trk.q_p[0, -150:]).mean()
    assert ip > 3 * qp


@pytest.mark.parametrize("data_type,scale", [("schar", 1.0),
                                             ("int16", 64.0)])
def test_iq_file(tmp_path, data_type, scale):
    cfg = get_config("gps_l1ca", sampling_freq=2.048e6, if_freq=7000.0,
                     acq_satellite_list=(PRN, PRN + 3),
                     acq_threshold=2.5, file_type=2, data_type=data_type,
                     file_name=str(tmp_path / f"iq_{data_type}.bin"))
    samples = _scene(cfg)
    dt = np.int8 if data_type == "schar" else np.int16
    out = np.empty(samples.size * 2, dt)
    out[0::2] = np.clip(np.round(samples.real * scale), -127 * scale,
                        127 * scale).astype(dt)
    out[1::2] = np.clip(np.round(samples.imag * scale), -127 * scale,
                        127 * scale).astype(dt)
    out.tofile(cfg.file_name)
    res = Receiver(cfg).run(n_epochs=300)
    _check(res, cfg)


def test_real_file_schar(tmp_path):
    # real sampling needs IF above half the code bandwidth so the −IF
    # image stays out of the correlator band; fs/4 is the classic choice
    cfg = get_config("gps_l1ca", sampling_freq=4.096e6, if_freq=1.024e6,
                     acq_satellite_list=(PRN, PRN + 3),
                     acq_threshold=2.2, file_type=1, data_type="schar",
                     file_name=str(tmp_path / "real.bin"))
    samples = _scene(cfg)
    np.clip(np.round(samples.real * np.sqrt(2.0)), -127,
            127).astype(np.int8).tofile(cfg.file_name)
    res = Receiver(cfg).run(n_epochs=300)
    _check(res, cfg)


def test_skip_samples_resume(tmp_path):
    """skipNumberOfBytes mid-file resume (initSettings.m:53)."""
    cfg = get_config("gps_l1ca", sampling_freq=2.048e6, if_freq=7000.0,
                     acq_satellite_list=(PRN,), acq_threshold=2.5,
                     file_type=2, data_type="schar",
                     file_name=str(tmp_path / "skip.bin"))
    samples = _scene(cfg, num_ms=120)
    out = np.empty(samples.size * 2, np.int8)
    out[0::2] = np.clip(np.round(samples.real), -127, 127)
    out[1::2] = np.clip(np.round(samples.imag), -127, 127)
    out.tofile(cfg.file_name)
    skip = 3 * cfg.samples_per_code
    arr = read_if_file(cfg.file_name, cfg, offset_samples=skip)
    assert np.array_equal(arr, out[2 * skip:])


def test_unpack_2bit_matches_lut():
    """unpack_cplx.m 2-bit sign/magnitude mapping to ±1/±3."""
    raw = np.arange(256, dtype=np.uint8)
    out = unpack_2bit_iq(raw)
    assert out.dtype == np.int8
    assert set(np.unique(out)) <= {-3, -1, 1, 3}
    assert out.size == raw.size * 4
