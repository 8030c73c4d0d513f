"""Probe 3: (NR,4,128) tile-shaped DMA; bisect the one-hot matmul."""
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_enable_x64", True)


def probe(name, fn):
    try:
        out = np.asarray(fn())
        print(f"RESULT {name}: OK {out.reshape(-1)[:6]}")
        return out
    except Exception as e:
        lines = str(e).split("\n")
        key = next(("\n".join(lines[i:i + 2]) for i, l in enumerate(lines)
                    if "Mosaic failed to compile" in l),
                   "\n".join(lines[:2]))
        print(f"RESULT {name}: FAIL\n{key}")
        return None


# ---- P5: DMA rows [q, q+T) of (NR, 4, 128) i8 at arbitrary q ----------
NR, T = 512, 12
rec = jnp.asarray(np.arange(NR * 512, dtype=np.int32).astype(np.int8)
                  .reshape(NR, 4, 128))


def k_p5(q_r, rec_r, o_r, scratch, sem):
    q = q_r[0].astype(jnp.int32)
    cp = pltpu.make_async_copy(rec_r.at[pl.ds(q, T)], scratch, sem)
    cp.start()
    cp.wait()
    o_r[:] = scratch[:]


gs = pltpu.PrefetchScalarGridSpec(
    num_scalar_prefetch=1, grid=(1,),
    in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
    out_specs=pl.BlockSpec((T, 4, 128), lambda i, *_: (0, 0, 0),
                           memory_space=pltpu.VMEM),
    scratch_shapes=[pltpu.VMEM((T, 4, 128), jnp.int8),
                    pltpu.SemaphoreType.DMA],
)
f_p5 = pl.pallas_call(
    k_p5, grid_spec=gs,
    out_shape=jax.ShapeDtypeStruct((T, 4, 128), jnp.int8))
out = probe("P5 dma (NR,4,128) q=37", lambda: f_p5(
    jnp.asarray([37], jnp.int32), rec))
if out is not None:
    exp = np.arange(37 * 512, (37 + T) * 512, dtype=np.int32).astype(
        np.int8).reshape(T, 4, 128)
    print("   P5 values correct:", np.array_equal(out, exp))


# ---- P6: in-kernel reshape (T,4,128)->(4T,128) ------------------------
def k_p6(q_r, rec_r, o_r, scratch, sem):
    q = q_r[0].astype(jnp.int32)
    cp = pltpu.make_async_copy(rec_r.at[pl.ds(q, T)], scratch, sem)
    cp.start()
    cp.wait()
    o_r[:] = scratch[:].reshape(4 * T, 128)


gs6 = pltpu.PrefetchScalarGridSpec(
    num_scalar_prefetch=1, grid=(1,),
    in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
    out_specs=pl.BlockSpec((4 * T, 128), lambda i, *_: (0, 0),
                           memory_space=pltpu.VMEM),
    scratch_shapes=[pltpu.VMEM((T, 4, 128), jnp.int8),
                    pltpu.SemaphoreType.DMA],
)
f_p6 = pl.pallas_call(
    k_p6, grid_spec=gs6,
    out_shape=jax.ShapeDtypeStruct((4 * T, 128), jnp.int8))
out = probe("P6 dma + reshape to (4T,128)", lambda: f_p6(
    jnp.asarray([37], jnp.int32), rec))
if out is not None:
    exp = np.arange(37 * 512, (37 + T) * 512, dtype=np.int32).astype(
        np.int8).reshape(4 * T, 128)
    print("   P6 values correct:", np.array_equal(out, exp))


# ---- P7 bisect one-hot matmul -----------------------------------------
TP = 8
x_np = (np.arange((TP + 1) * 128, dtype=np.int32) % 251 - 125)
x8 = jnp.asarray(x_np.astype(np.int8).reshape(TP + 1, 128))
xf = jnp.asarray(x_np.astype(np.float32).reshape(TP + 1, 128))
r_test = 37

gs3f = pltpu.PrefetchScalarGridSpec(
    num_scalar_prefetch=1, grid=(1,),
    in_specs=[pl.BlockSpec((TP + 1, 128), lambda i, *_: (0, 0),
                           memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec((TP, 128), lambda i, *_: (0, 0),
                           memory_space=pltpu.VMEM),
)


def mk(kern, x):
    f = pl.pallas_call(kern, grid_spec=gs3f,
                       out_shape=jax.ShapeDtypeStruct((TP, 128),
                                                      jnp.float32))
    return lambda: f(jnp.asarray([r_test], jnp.int32), x)


# P7a: static one-hot f32 matmul (no dynamic scalar)
def k_p7a(r_r, x_r, o_r):
    a = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
    b = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
    m1 = (a == b + 37).astype(jnp.float32)
    o_r[:] = jax.lax.dot_general(x_r[:].astype(jnp.float32)[:TP], m1,
                                 (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)


probe("P7a static one-hot f32 matmul (i8 in)", mk(k_p7a, x8))


# P7b: same but f32 input
def k_p7b(r_r, x_r, o_r):
    a = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
    b = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
    m1 = (a == b + 37).astype(jnp.float32)
    o_r[:] = jax.lax.dot_general(x_r[:][:TP], m1, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)


probe("P7b static one-hot f32 matmul (f32 in)", mk(k_p7b, xf))


# P7c: dynamic scalar in one-hot, f32 matmul, f32 input
def k_p7c(r_r, x_r, o_r):
    r = r_r[0].astype(jnp.int32)
    a = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
    b = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
    m1 = (a == b + r).astype(jnp.float32)
    o_r[:] = jax.lax.dot_general(x_r[:][:TP], m1, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)


out = probe("P7c dynamic one-hot f32 matmul", mk(k_p7c, xf))
if out is not None:
    flat = x_np.astype(np.float32).reshape(TP + 1, 128)
    m1 = (np.arange(128)[:, None] == np.arange(128)[None, :] + r_test)
    exp = flat[:TP] @ m1
    print("   P7c values correct:", np.array_equal(out, exp))


# P7d: dynamic one-hot bf16 matmul, f32 input cast
def k_p7d(r_r, x_r, o_r):
    r = r_r[0].astype(jnp.int32)
    a = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
    b = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
    m1 = (a == b + r).astype(jnp.bfloat16)
    o_r[:] = jax.lax.dot_general(x_r[:][:TP].astype(jnp.bfloat16), m1,
                                 (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)


probe("P7d dynamic one-hot bf16 matmul", mk(k_p7d, xf))
