"""Probe 2: leading-dim DMA from (NR, 1, 128) i8 HBM at arbitrary row
offsets, and in-kernel one-hot rotate matmuls (the exact-shift trick).
"""
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
                    if "Mosaic failed to compile" in l), "\n".join(lines[:2]))
        print(f"RESULT {name}: FAIL\n{key}")
        return None


# ---- P2: DMA rows [q, q+T) of (NR, 1, 128) i8 at arbitrary q ----------
NR, T = 512, 12
rec = jnp.asarray(np.arange(NR * 128, dtype=np.int32).astype(np.int8)
                  .reshape(NR, 1, 128))


def k_p2(q_r, rec_r, o_r, scratch, sem):
    q = q_r[0].astype(jnp.int32)
    cp = pltpu.make_async_copy(rec_r.at[pl.ds(q, T)], scratch, sem)
    cp.start()
    cp.wait()
    o_r[:] = scratch[:, 0, :]


gs = pltpu.PrefetchScalarGridSpec(
    num_scalar_prefetch=1, grid=(1,),
    in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
    out_specs=pl.BlockSpec((T, 128), lambda i, *_: (0, 0),
                           memory_space=pltpu.VMEM),
    scratch_shapes=[pltpu.VMEM((T, 1, 128), jnp.int8),
                    pltpu.SemaphoreType.DMA],
)
f_p2 = pl.pallas_call(
    k_p2, grid_spec=gs,
    out_shape=jax.ShapeDtypeStruct((T, 128), jnp.int8))
out = probe("P2 dma (NR,1,128) arbitrary row q=37",
            lambda: f_p2(jnp.asarray([37], jnp.int32), rec))
if out is not None:
    exp = np.arange(37 * 128, (37 + T) * 128, dtype=np.int32).astype(
        np.int8).reshape(T, 128)
    print("   P2 values correct:", np.array_equal(out, exp))


# ---- P2b: 4-D table (C, TR, 1, 128) at arbitrary (c, q) ---------------
C4, TR = 4, 256
tab = jnp.asarray(np.arange(C4 * TR * 128, dtype=np.int32).astype(np.int8)
                  .reshape(C4, TR, 1, 128))


def k_p2b(cq_r, tab_r, o_r, scratch, sem):
    c = cq_r[0].astype(jnp.int32)
    q = cq_r[1].astype(jnp.int32)
    cp = pltpu.make_async_copy(tab_r.at[c, pl.ds(q, T)], scratch, sem)
    cp.start()
    cp.wait()
    o_r[:] = scratch[:, 0, :]


f_p2b = pl.pallas_call(
    k_p2b, grid_spec=gs,
    out_shape=jax.ShapeDtypeStruct((T, 128), jnp.int8))
out = probe("P2b dma 4-D (c,q)=(2,41)",
            lambda: f_p2b(jnp.asarray([2, 41], jnp.int32), tab))
if out is not None:
    exp = (np.arange(2 * TR * 128 + 41 * 128,
                     2 * TR * 128 + (41 + T) * 128, dtype=np.int32)
           .astype(np.int8).reshape(T, 128))
    print("   P2b values correct:", np.array_equal(out, exp))


# ---- P3: in-kernel one-hot rotate matmul ------------------------------
# rotate a flattened (T,128) i8 window left by r in [0,128):
#   Z = X[0:T] @ M1 + X[1:T+1] @ M2,  M1[a,b]=1 iff a==b+r (b+r<128),
#   M2[a,b]=1 iff a==b+r-128
TP = 8


def k_p3(r_r, x_r, o_r):
    r = r_r[0].astype(jnp.int32)
    a = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)  # source lane
    b = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)  # target lane
    m1 = (a == b + r).astype(jnp.bfloat16)
    m2 = (a == b + r - 128).astype(jnp.bfloat16)
    x = x_r[:].astype(jnp.bfloat16)
    z = (jax.lax.dot_general(x[:TP], m1, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
         + jax.lax.dot_general(x[1:TP + 1], m2, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32))
    o_r[:] = z


x_np = np.arange((TP + 1) * 128, dtype=np.int32) % 251 - 125
x_in = jnp.asarray(x_np.astype(np.int8).reshape(TP + 1, 128))
gs3 = pltpu.PrefetchScalarGridSpec(
    num_scalar_prefetch=1, grid=(1,),
    in_specs=[pl.BlockSpec((TP + 1, 128), lambda i, *_: (0, 0),
                           memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec((TP, 128), lambda i, *_: (0, 0),
                           memory_space=pltpu.VMEM),
)
f_p3 = pl.pallas_call(k_p3, grid_spec=gs3,
                      out_shape=jax.ShapeDtypeStruct((TP, 128),
                                                     jnp.float32))
r_test = 37
out = probe("P3 one-hot rotate matmul r=37",
            lambda: f_p3(jnp.asarray([r_test], jnp.int32), x_in))
if out is not None:
    flat = x_np.astype(np.float32)
    exp = flat[r_test:r_test + TP * 128].reshape(TP, 128)
    print("   P3 values correct:", np.array_equal(out, exp))


# ---- P4: dynamic pltpu.roll error text --------------------------------
def k_p4(r_r, x_r, o_r):
    r = r_r[0].astype(jnp.int32)
    o_r[:] = pltpu.roll(x_r[:].astype(jnp.float32), -r, 1)[:TP]


f_p4 = pl.pallas_call(k_p4, grid_spec=gs3,
                      out_shape=jax.ShapeDtypeStruct((TP, 128),
                                                     jnp.float32))
out = probe("P4 pltpu.roll dynamic",
            lambda: f_p4(jnp.asarray([r_test], jnp.int32), x_in))
if out is not None:
    flat = x_np.astype(np.float32)
    rolled = np.roll(flat.reshape(TP + 1, 128), -r_test, axis=1)[:TP]
    print("   P4 values==lane-roll:", np.array_equal(out, rolled))
