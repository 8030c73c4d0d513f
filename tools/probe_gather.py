"""Measure XLA window-staging variants on the TPU.

The flat time-parallel tracking path stages [C=480, ~18k] sample/replica
windows per scan step.  vmapped dynamic_slice on int8 measured 3.2 GB/s;
find a formulation nearer HBM bandwidth.
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

C = 480
BLK = 18048
N_IT = 20


def timeit(step, init, n=3):
    @jax.jit
    def run():
        c = init
        for _ in range(N_IT):
            c = step(c)
        return jax.tree.map(lambda x: x.reshape(-1)[0], c)

    np.asarray(jax.tree.map(np.asarray, run()))
    best = np.inf
    for _ in range(n):
        t0 = time.perf_counter()
        np.asarray(jax.tree.map(np.asarray, run()))
        best = min(best, time.perf_counter() - t0)
    return best / N_IT


rng = np.random.default_rng(0)
S = (64 + 4) * 18000
rec8 = jnp.asarray(rng.integers(-16, 16, S), jnp.int8)
offs0 = jnp.asarray(rng.integers(0, S - BLK - 64, C), jnp.int32)
nbytes = C * BLK


def report(name, t, bytes_staged=nbytes):
    print(f"{name}: {t*1e3:8.3f} ms  {bytes_staged/t/1e9:7.1f} GB/s")


# A: vmap dynamic_slice int8 (the current path)
def step_a(offs):
    w = jax.vmap(lambda o: jax.lax.dynamic_slice(rec8, (o,), (BLK,)))(offs)
    return (offs + w[:, 0].astype(jnp.int32)) % (S - BLK - 64)

report("A  vmap dynslice i8          ", timeit(step_a, offs0))

# B: int32 view, offsets quantized to 4 samples
rec32 = jnp.asarray(rng.integers(-2**30, 2**30, S // 4), jnp.int32)

def step_b(offs):
    o4 = offs // 4
    w = jax.vmap(lambda o: jax.lax.dynamic_slice(
        rec32, (o,), (BLK // 4,)))(o4)
    return (offs + w[:, 0] % 7) % (S - BLK - 64)

report("B  vmap dynslice i32 (4-q)   ", timeit(step_b, offs0))

# C: 2-D row-gather, offsets quantized to 512 samples
ROW = 512
rec2d = rec8[: (S // ROW) * ROW].reshape(S // ROW, ROW)
NR = BLK // ROW + 2

def step_c(offs):
    r0 = offs // ROW
    w = jax.vmap(lambda r: jax.lax.dynamic_slice(
        rec2d, (r, 0), (NR, ROW)))(r0)
    return (offs + w[:, 0, 0].astype(jnp.int32)) % (S - BLK - 64)

report("C  vmap dynslice 2d rows i8  ", timeit(step_c, offs0),
       C * NR * ROW)

# D: jnp.take rows (gather on leading axis)
def step_d(offs):
    r0 = offs // ROW
    ids = r0[:, None] + jnp.arange(NR)[None, :]
    w = jnp.take(rec2d, ids, axis=0)
    return (offs + w[:, 0, 0].astype(jnp.int32)) % (S - BLK - 64)

report("D  take rows i8              ", timeit(step_d, offs0),
       C * NR * ROW)

# E: same as D but int32 rows
rec2d32 = rec32[: (S // 4 // 128) * 128].reshape(-1, 128)
NR32 = (BLK // 4) // 128 + 2

def step_e(offs):
    r0 = offs // ROW
    ids = r0[:, None] + jnp.arange(NR32)[None, :]
    w = jnp.take(rec2d32, ids, axis=0)
    return (offs + (w[:, 0, 0] % 5).astype(jnp.int32)) % (S - BLK - 64)

report("E  take rows i32             ", timeit(step_e, offs0),
       C * NR32 * 512)

# F: f32 record gather (4x bytes)
recf = rec8.astype(jnp.float32)

def step_f(offs):
    w = jax.vmap(lambda o: jax.lax.dynamic_slice(recf, (o,), (BLK,)))(offs)
    return (offs + w[:, 0].astype(jnp.int32)) % (S - BLK - 64)

report("F  vmap dynslice f32         ", timeit(step_f, offs0), nbytes * 4)
