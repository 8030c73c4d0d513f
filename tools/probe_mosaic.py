"""Probe Mosaic alignment rules on the real chip.

Q1: DMA i8 1-D HBM->VMEM with ARBITRARY offset, 1024-multiple size?
Q2: same with 1024-aligned offset?
Q3: dynamic-start lane slice from VMEM i8 ref (per-row)?
Q4: dynamic-start lane slice from VMEM f32 ref?
"""
import functools
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_enable_x64", True)

S = 1 << 16
W = 2048
x = jnp.asarray(np.arange(S, dtype=np.int32).astype(np.int8))


def probe(name, fn):
    try:
        out = np.asarray(fn())
        print(f"{name}: OK   out[:4]={out.reshape(-1)[:4]}")
        return True
    except Exception as e:
        msg = str(e).split("\n")[0][:140]
        print(f"{name}: FAIL {type(e).__name__}: {msg}")
        return False


def dma_kernel(off_r, x_r, o_r, scratch, sem):
    so = off_r[0].astype(jnp.int32)
    cp = pltpu.make_async_copy(x_r.at[pl.ds(so, W)], scratch, sem)
    cp.start()
    cp.wait()
    o_r[:] = scratch[:].reshape(W // 128, 128)


def make_dma(off_val):
    off = jnp.asarray([off_val], jnp.int32)
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((W // 128, 128), lambda i, *_: (0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((W,), jnp.int8),
                        pltpu.SemaphoreType.DMA],
    )
    f = pl.pallas_call(dma_kernel, grid_spec=gs,
                       out_shape=jax.ShapeDtypeStruct((W // 128, 128),
                                                      jnp.int8))
    return lambda: f(off, x)


probe("Q1 dma offset=37  size=2048", make_dma(37))
probe("Q1b dma offset=512 size=2048", make_dma(512))
probe("Q2 dma offset=1024 size=2048", make_dma(1024))


# Q3: per-row dynamic lane slice from a VMEM ref
C, TW, OW = 8, 4096, 1024
y8 = jnp.asarray(np.arange(C * TW, dtype=np.int32).reshape(C, TW)
                 .astype(np.int8))
y32 = y8.astype(jnp.float32)
offs = jnp.asarray(np.arange(C, dtype=np.int32) * 7 + 3)


def dyn_kernel(off_r, y_r, o_r):
    rows = []
    for c in range(C):
        d = off_r[c].astype(jnp.int32)
        rows.append(y_r[jnp.int32(c), pl.ds(d, OW)])
    o_r[:] = jnp.stack(rows)


def make_dyn(y, dtype):
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(1,),
        in_specs=[pl.BlockSpec((C, TW), lambda i, *_: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((C, OW), lambda i, *_: (0, 0),
                               memory_space=pltpu.VMEM),
    )
    f = pl.pallas_call(dyn_kernel, grid_spec=gs,
                       out_shape=jax.ShapeDtypeStruct((C, OW), dtype))
    return lambda: f(offs, y)


probe("Q3 vmem dyn lane slice i8 ", make_dyn(y8, jnp.int8))
probe("Q4 vmem dyn lane slice f32", make_dyn(y32, jnp.float32))


# Q5: whole-block dynamic lane slice (same offset all rows)
def dyn1_kernel(off_r, y_r, o_r):
    d = off_r[0].astype(jnp.int32)
    o_r[:] = y_r[:, pl.ds(d, OW)]


def make_dyn1(y, dtype):
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(1,),
        in_specs=[pl.BlockSpec((C, TW), lambda i, *_: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((C, OW), lambda i, *_: (0, 0),
                               memory_space=pltpu.VMEM),
    )
    f = pl.pallas_call(dyn1_kernel, grid_spec=gs,
                       out_shape=jax.ShapeDtypeStruct((C, OW), dtype))
    return lambda: f(offs, y)


probe("Q5 vmem dyn slice shared f32", make_dyn1(y32, jnp.float32))
probe("Q5b vmem dyn slice shared i8", make_dyn1(y8, jnp.int8))
