"""Probe: (tiles,)-grid chunk loop with manual double-buffered DMA.

The production big-mesh kernel runs grid (tiles, n_chunks): every chunk
SLOT costs ~5.5 us of pipeline floor whether or not the tile listed the
chunk (8-9 ms/bounce at ico5's 6 chunks; ~linear in mesh size).  The
designed replacement runs grid (tiles,) with an in-kernel
`fori_loop(0, cnt[t])` over the tile's LISTED chunks only, streaming each
chunk's [T, 128] triangle block HBM->VMEM with double-buffered
`pltpu.make_async_copy` — per-tile cost proportional to cnt, floor
proportional to tiles alone.

This probe validates the pattern compiles on the real chip and measures
both schemes' floors and per-listed-chunk costs on synthetic tables with
a controllable cnt distribution.  Run on TPU:

  PYTHONPATH=/root/.axon_site:/root/repo python benchmarks/dma_chunk_probe.py

STATUS (end of round 3): first attempt ABORTED the TPU backend at the
dma variant (error text pointed at the pltpu.ANY operand; the abort then
poisoned the process and the device needed ~3 min to recover).  Round-4
starting points: give the ANY operand an explicit index_map-free spec or
use pltpu.HBM; try `pl.ds` on the first axis only via `.at[]` ref
slicing; verify semaphore shapes.  Do NOT run this while anything else
needs the chip — a failed run takes the device down briefly.
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

S, L = 8, 1024
T = 4096          # triangle rows per chunk
N_CHUNKS = 6
TILES = 255


def make_dma_call(n_chunks):
    def kernel(wl_ref, cnt_ref, hbm_ref, o_ref, out_ref):
        t = pl.program_id(0)
        n = cnt_ref[t]
        o = o_ref[0]

        def body(tri_vmem, sem):
            def get_dma(slot, j):
                c = wl_ref[t, j]
                return pltpu.make_async_copy(
                    hbm_ref.at[pl.ds(c * T, T), :],
                    tri_vmem.at[slot],
                    sem.at[slot],
                )

            @pl.when(n > 0)
            def _():
                get_dma(0, 0).start()

            def loop(j, acc):
                slot = jax.lax.rem(j, 2)

                @pl.when(j + 1 < n)
                def _():
                    get_dma(1 - slot, j + 1).start()

                get_dma(slot, j).wait()
                # Cheap stand-in fold: touch every 16-row cluster once.
                def clu(cc, acc):
                    blk = tri_vmem[slot, pl.ds(cc * 16, 16), :]
                    col = blk[:, 0:1][:, :, None]
                    return acc + jnp.min(col * o[None], axis=0)

                return jax.lax.fori_loop(0, T // 16, clu, acc)

            acc = jax.lax.fori_loop(
                0, n, loop, jnp.zeros((S, L), jnp.float32))
            out_ref[0] = acc

        pl.run_scoped(
            body,
            pltpu.VMEM((2, T, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(TILES,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),   # chunk table in HBM
            pl.BlockSpec((1, S, L), lambda t, wl, cnt: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, S, L), lambda t, wl, cnt: (t, 0, 0),
                               memory_space=pltpu.VMEM),
    )

    @jax.jit
    def call(wl, cnt, tab, o):
        return pl.pallas_call(
            kernel, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((TILES, S, L), jnp.float32),
        )(wl, cnt, tab, o)

    return call


def make_pipeline_call(n_chunks):
    """The production scheme: grid (tiles, chunks), BlockSpec streaming."""
    def kernel(wl_ref, cnt_ref, tab_ref, o_ref, out_ref, acc_ref):
        t = pl.program_id(0)
        c = pl.program_id(1)
        o = o_ref[0]

        @pl.when(c == 0)
        def _():
            acc_ref[0] = jnp.zeros((S, L), jnp.float32)

        @pl.when(c < cnt_ref[t])
        def _():
            def clu(cc, acc):
                blk = tab_ref[pl.ds(cc * 16, 16), :]
                col = blk[:, 0:1][:, :, None]
                return acc + jnp.min(col * o[None], axis=0)

            acc_ref[0] = jax.lax.fori_loop(0, T // 16, clu, acc_ref[0])

        @pl.when(c == n_chunks - 1)
        def _():
            out_ref[0] = acc_ref[0]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(TILES, n_chunks),
        in_specs=[
            pl.BlockSpec((T, 128), lambda t, c, wl, cnt: (wl[t, c], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, L), lambda t, c, wl, cnt: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, S, L), lambda t, c, wl, cnt: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((1, S, L), jnp.float32)],
    )

    @jax.jit
    def call(wl, cnt, tab, o):
        return pl.pallas_call(
            kernel, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((TILES, S, L), jnp.float32),
        )(wl, cnt, tab, o)

    return call


def worklist(avg_cnt, seed=0):
    """Per-tile ascending chunk lists with the given mean count; trailing
    slots repeat the last listed id (the production DMA-elision rule)."""
    rng = np.random.default_rng(seed)
    wl = np.zeros((TILES, N_CHUNKS), np.int32)
    cnt = np.zeros((TILES,), np.int32)
    for t in range(TILES):
        k = min(N_CHUNKS, max(0, int(rng.poisson(avg_cnt))))
        ids = np.sort(rng.choice(N_CHUNKS, size=max(k, 1), replace=False))
        wl[t, :k] = ids[:k]
        wl[t, k:] = ids[min(k, len(ids) - 1)]
        cnt[t] = k
    return jnp.asarray(wl), jnp.asarray(cnt)


def bench(call, wl, cnt, tab, o, iters=20):
    out = call(wl, cnt, tab, o)
    out.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(iters):
        out = call(wl, cnt, tab, o)
    out.block_until_ready()
    return (time.perf_counter() - t0) / iters, float(out.sum())


def main():
    tab = jnp.asarray(
        np.random.default_rng(1).normal(size=(N_CHUNKS * T, 128)),
        jnp.float32)
    o = jnp.ones((1, S, L), jnp.float32)
    dma = make_dma_call(N_CHUNKS)
    pipe = make_pipeline_call(N_CHUNKS)
    for avg in (0.0, 0.5, 2.0, float(N_CHUNKS)):
        wl, cnt = worklist(avg)
        row = f"avg_cnt={float(jnp.mean(cnt)):4.2f}:"
        for name, call in (("dma", dma), ("pipe", pipe)):
            try:
                dt, s = bench(call, wl, cnt, tab, o)
                row += f"  {name} {dt*1e3:7.3f} ms (sum {s:.0f})"
            except Exception as e:  # noqa: BLE001 — probe reports and moves on
                row += f"  {name} FAILED: {str(e)[:120]}"
        print(row, flush=True)


if __name__ == "__main__":
    main()
