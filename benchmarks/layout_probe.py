"""Mosaic layout probe: which chunk-table layout can feed the row fold?

Candidates for the chunked big-mesh triangle tables (17 scalar fields per
triangle, read as [K,1,1] broadcasts per 16-triangle cluster):

  A  [R,1,1] rows       — round-2 layout; each row pads to 512B in VMEM
                          (69MB scoped at BIG_CHUNK_T=4096 -> compile error)
  B  [R,128] lane-fields — row=triangle, lane=field; dense (8,128) tiles;
                          fold slices (K,128) then extracts 17 lanes

This script compiles+times tiny kernels for each on the real TPU.
"""

import functools
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

S, L, K = 8, 1024, 16
T = 4096          # triangles per chunk
NCHUNK = 5
NCLU = T // K


def kernel_b(tab_ref, o_ref, out_ref):
    o = o_ref[0]
    acc = jnp.zeros((S, L), jnp.float32)

    def fold(cc, acc):
        blk = tab_ref[pl.ds(cc * K, K), :]          # (K, 128)
        cols = [blk[:, k:k + 1][:, :, None] for k in range(3)]  # (K,1,1)
        nx, ny, nz = cols
        v = nx * o[None] + ny * 2.0 + nz
        return acc + jnp.min(v, axis=0)

    acc = jax.lax.fori_loop(0, NCLU, fold, acc)
    out_ref[0] = acc


def run_b():
    tab = jnp.arange(NCHUNK * T * 128, dtype=jnp.float32).reshape(-1, 128)
    o = jnp.ones((1, S, L), jnp.float32)
    grid = 8

    f = pl.pallas_call(
        kernel_b,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((T, 128), lambda t: (t % NCHUNK, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, L), lambda t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, S, L), lambda t: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((grid, S, L), jnp.float32),
    )
    t0 = time.perf_counter()
    r = jax.jit(f)(tab, o)
    r.block_until_ready()
    print(f"B compile+run: {time.perf_counter()-t0:.1f}s", float(r.sum()))
    t0 = time.perf_counter()
    for _ in range(20):
        r = jax.jit(f)(tab, o)
    r.block_until_ready()
    dt = (time.perf_counter() - t0) / 20
    work = grid * NCLU * K * S * L * 3
    print(f"B steady: {dt*1e3:.2f} ms  ({work/dt/1e9:.1f} Gop/s)")


def kernel_a(tab_ref, o_ref, out_ref):
    o = o_ref[0]
    acc = jnp.zeros((S, L), jnp.float32)

    def fold(cc, acc):
        def col(k):
            return tab_ref[pl.ds(k * T + cc * K, K)]
        nx, ny, nz = col(0), col(1), col(2)
        v = nx * o[None] + ny * 2.0 + nz
        return acc + jnp.min(v, axis=0)

    acc = jax.lax.fori_loop(0, NCLU, fold, acc)
    out_ref[0] = acc


def run_a(t=T):
    global T, NCLU
    T, NCLU = t, t // K
    tab = jnp.ones((NCHUNK * 3 * T, 1, 1), jnp.float32)
    o = jnp.ones((1, S, L), jnp.float32)
    grid = 8
    f = pl.pallas_call(
        kernel_a,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((3 * T, 1, 1), lambda tt: (tt % NCHUNK, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, L), lambda tt: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, S, L), lambda tt: (tt, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((grid, S, L), jnp.float32),
    )
    t0 = time.perf_counter()
    r = jax.jit(f)(tab, o)
    r.block_until_ready()
    print(f"A(T={t}) compile+run: {time.perf_counter()-t0:.1f}s",
          float(r.sum()))
    t0 = time.perf_counter()
    for _ in range(20):
        r = jax.jit(f)(tab, o)
    r.block_until_ready()
    dt = (time.perf_counter() - t0) / 20
    work = grid * NCLU * K * S * L * 3
    print(f"A steady: {dt*1e3:.2f} ms  ({work/dt/1e9:.1f} Gop/s)")


if __name__ == "__main__":
    try:
        run_b()
    except Exception as e:
        print("B FAILED:", str(e)[:500])
    try:
        run_a(512)
    except Exception as e:
        print("A512 FAILED:", str(e)[:300])
    try:
        run_a(4096)
    except Exception as e:
        print("A4096 FAILED:", str(e)[:300])
