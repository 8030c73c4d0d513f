"""Worker process for tests/test_multihost.py.

Joins a 2-process JAX runtime over the CPU backend (gloo DCN
collectives), builds a 2-D (ch x tb) global mesh spanning both
processes, runs time-parallel tracking sharded over it, and checks the
stitched result VALUE-matches the locally computed sequential engine —
the multi-host analog of tests/test_timeblocks.py::test_exact_handoff_parity.

Invoked as: python multihost_worker.py <coordinator_port> <process_id>
(not a pytest file — the test spawns two of these and asserts rc == 0).
"""

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402


def main():
    port, pid = sys.argv[1], int(sys.argv[2])
    from cusdr_tpu.parallel.distributed import (init_distributed,
                                                make_mesh_2d)
    init_distributed(f"localhost:{port}", num_processes=2, process_id=pid)
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 4, jax.devices()

    from cusdr_tpu import get_config
    from cusdr_tpu.io.synth import SynthSV, quantize_iq_int8, synthesize_if
    from cusdr_tpu.parallel.timeblocks import track_time_parallel
    from cusdr_tpu.signals.defs import get_signal
    from cusdr_tpu.tracking import track

    cfg = get_config("gps_l1ca", sampling_freq=1.024e6, if_freq=7000.0)
    sig = get_signal("gps_l1ca")
    rng = np.random.default_rng(0)
    svs = [SynthSV(prn=7, code_phase=123.0, doppler_hz=2500.0,
                   cn0_dbhz=47,
                   nav_bits=rng.choice(np.asarray([-1, 1], np.int8), 40)),
           SynthSV(prn=13, code_phase=400.2, doppler_hz=-3200.0,
                   cn0_dbhz=45,
                   nav_bits=rng.choice(np.asarray([-1, 1], np.int8), 40))]
    n_epochs, n_blocks = 80, 4
    iq = quantize_iq_int8(synthesize_if(cfg, sig, svs,
                                        num_ms=n_epochs + 10, seed=3))
    chans = [(7, 9500.0, 123), (13, 3800.0, 401)]

    # 'ch' across the two processes (DCN), 'tb' across each process's
    # two local devices (ICI-analog)
    mesh = make_mesh_2d(n_ch=2, n_tb=2)
    assert {d.process_index for d in mesh.devices[0]} == {0}
    assert {d.process_index for d in mesh.devices[1]} == {1}

    par = track_time_parallel(cfg, sig, iq, chans, n_epochs=n_epochs,
                              n_blocks=n_blocks,
                              handoff_iters=n_blocks - 1, mesh=mesh)
    seq = track(cfg, sig, iq, chans, n_epochs=n_epochs)

    # every process reconstructs the full stitched result (allgather) and
    # must match the sequential trajectory in VALUES, not just shapes
    np.testing.assert_array_equal(par.abs_sample, seq.abs_sample)
    np.testing.assert_allclose(par.carr_freq, seq.carr_freq,
                               rtol=0, atol=1e-6)
    np.testing.assert_allclose(par.code_freq, seq.code_freq,
                               rtol=0, atol=1e-6)
    np.testing.assert_allclose(par.i_p, seq.i_p, rtol=1e-4, atol=0.5)
    np.testing.assert_allclose(par.q_p, seq.q_p, rtol=1e-4, atol=0.5)
    print(f"proc {pid}: multihost parity OK "
          f"({jax.process_count()} processes, {len(jax.devices())} "
          f"devices, mesh ch x tb = {mesh.devices.shape})", flush=True)


if __name__ == "__main__":
    main()
