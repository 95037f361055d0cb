"""Probe: (tiles,)-grid chunk loop with manual/pipelined chunk DMA.

The production big-mesh kernel runs grid (tiles, n_chunks): every chunk
SLOT costs ~5.5 us of pipeline floor whether or not the tile listed the
chunk (8-9 ms/bounce at ico5's 6 chunks; ~linear in mesh size).  The
designed replacement runs grid (tiles,) with an in-kernel loop over the
tile's LISTED chunks only, streaming each chunk's [T, 128] triangle
block HBM->VMEM — per-tile cost proportional to cnt, floor proportional
to tiles alone.

Variants (each verifies sum vs a numpy oracle where cheap):
  mindma  single static make_async_copy HBM->VMEM scratch
  dyndma  same with a chunk index read from the scalar-prefetch ref
  dbldma  full double-buffered fori_loop (guide "Double Buffering")
  emit    pltpu.emit_pipeline with a DYNAMIC grid=(cnt[t],)
  pipe    production baseline: grid (tiles, chunks) BlockSpec streaming

A failed Pallas launch ABORTS the axon backend and poisons the process
(device needs ~3 min to recover), so each variant runs in its own
subprocess: `python benchmarks/dma_chunk_probe.py` forks one child per
variant; `python benchmarks/dma_chunk_probe.py VARIANT` runs one.

Run on TPU:
  PYTHONPATH=/root/.axon_site:/root/repo python benchmarks/dma_chunk_probe.py
"""

from __future__ import annotations

import os
import subprocess
import sys
import time
import traceback

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

S, L = 8, 1024
T = 4096          # triangle rows per chunk
N_CHUNKS = 6
TILES = 255

# PROBE_INTERPRET=1: run tiny shapes through the Pallas interpreter on CPU
# to validate variant logic/sums before spending TPU compiles (does NOT
# validate Mosaic layout rules — only the real chip does).
INTERPRET = os.environ.get("PROBE_INTERPRET", "") == "1"
if INTERPRET:
    T, N_CHUNKS, TILES = 64, 4, 7

VARIANTS = ("mindma", "dyndma", "dbldma", "emit", "pipe", "smemdma")
BSTRIDE = 2048    # compact per-chunk bounds stride (floats)


def _fold(tri, o, acc):
    """Cheap stand-in fold: touch every 16-row cluster once."""
    def clu(cc, acc):
        blk = tri[pl.ds(cc * 16, 16), :]
        col = blk[:, 0:1][:, :, None]
        return acc + jnp.min(col * o[None], axis=0)

    return jax.lax.fori_loop(0, T // 16, clu, acc)


def make_mindma_call():
    """One static-slice DMA HBM->VMEM scratch, fold, store."""
    def kernel(wl_ref, cnt_ref, hbm_ref, o_ref, out_ref):
        o = o_ref[0]

        def body(tri_vmem, sem):
            dma = pltpu.make_async_copy(
                hbm_ref.at[pl.ds(0, T), :], tri_vmem, sem)
            dma.start()
            dma.wait()
            out_ref[0] = _fold(tri_vmem, o, jnp.zeros((S, L), jnp.float32))

        pl.run_scoped(
            body,
            pltpu.VMEM((T, 128), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        )

    return _wrap(kernel)


def make_dyndma_call():
    """Single DMA with the chunk id read from the prefetch ref."""
    def kernel(wl_ref, cnt_ref, hbm_ref, o_ref, out_ref):
        t = pl.program_id(0)
        o = o_ref[0]
        c = wl_ref[t, 0]

        def body(tri_vmem, sem):
            dma = pltpu.make_async_copy(
                hbm_ref.at[pl.ds(c * T, T), :], tri_vmem, sem)
            dma.start()
            dma.wait()
            out_ref[0] = _fold(tri_vmem, o, jnp.zeros((S, L), jnp.float32))

        pl.run_scoped(
            body,
            pltpu.VMEM((T, 128), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        )

    return _wrap(kernel)


def make_dbldma_call():
    """Double-buffered dynamic chunk loop (the real target pattern)."""
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
                return _fold(tri_vmem.at[slot], o, acc)

            acc = jax.lax.fori_loop(
                0, n, loop, jnp.zeros((S, L), jnp.float32))
            out_ref[0] = acc

        pl.run_scoped(
            body,
            pltpu.VMEM((2, T, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        )

    return _wrap(kernel)


def make_emit_call():
    """pltpu.emit_pipeline with a dynamic grid=(cnt[t],): the pipeline
    DMAs exactly the listed chunks, double-buffered, index-mapped through
    the per-tile work list."""
    def kernel(wl_ref, cnt_ref, hbm_ref, o_ref, out_ref):
        t = pl.program_id(0)
        n = cnt_ref[t]
        o = o_ref[0]
        out_ref[0] = jnp.zeros((S, L), jnp.float32)

        def inner(tri_ref):
            out_ref[0] = _fold(tri_ref, o, out_ref[0])

        pipe = pltpu.emit_pipeline(
            inner,
            grid=(n,),
            in_specs=[pl.BlockSpec(
                (T, 128), lambda j: (wl_ref[t, j], 0))],
        )
        pipe(hbm_ref)

    return _wrap(kernel)


def make_smemdma_call():
    """dbldma plus an HBM->SMEM copy of a compact per-chunk bounds stride —
    validates that Mosaic supports async DMA into SMEM scratch (the
    production walk reads its 12 bound tables as SMEM scalars).  The
    bounds buffer is SINGLE-buffered 1D: SMEM is tiled (2,128), so a
    size-1 leading-axis slice of a (2,N) SMEM scratch fails alignment
    (measured compile error) — and at ~8 KB/chunk the un-overlapped DMA
    costs only microseconds.  The fold adds one SMEM scalar per chunk so
    the sum check catches wrong/missing bound data."""
    def kernel(wl_ref, cnt_ref, hbm_ref, bnd_ref, o_ref, out_ref):
        t = pl.program_id(0)
        n = cnt_ref[t]
        o = o_ref[0]

        def body(tri_vmem, bnd_smem, sem, bsem):
            def get_dma(slot, j):
                c = wl_ref[t, j]
                return pltpu.make_async_copy(
                    hbm_ref.at[pl.ds(c * T, T), :],
                    tri_vmem.at[slot],
                    sem.at[slot],
                )

            def get_bdma(j):
                c = wl_ref[t, j]
                return pltpu.make_async_copy(
                    bnd_ref.at[pl.ds(c * BSTRIDE, BSTRIDE)],
                    bnd_smem,
                    bsem,
                )

            @pl.when(n > 0)
            def _():
                get_dma(0, 0).start()
                get_bdma(0).start()

            def loop(j, acc):
                slot = jax.lax.rem(j, 2)

                @pl.when(j + 1 < n)
                def _():
                    get_dma(1 - slot, j + 1).start()

                get_bdma(j).wait()
                acc = acc + bnd_smem[0] + bnd_smem[BSTRIDE - 1]

                @pl.when(j + 1 < n)
                def _():
                    get_bdma(j + 1).start()

                get_dma(slot, j).wait()
                return _fold(tri_vmem.at[slot], o, acc)

            acc = jax.lax.fori_loop(
                0, n, loop, jnp.zeros((S, L), jnp.float32))
            out_ref[0] = acc

        pl.run_scoped(
            body,
            pltpu.VMEM((2, T, 128), jnp.float32),
            pltpu.SMEM((BSTRIDE,), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA(()),
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(TILES,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),   # bounds, HBM
            pl.BlockSpec((1, S, L), lambda t, wl, cnt: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, S, L), lambda t, wl, cnt: (t, 0, 0),
                               memory_space=pltpu.VMEM),
    )

    @jax.jit
    def call(wl, cnt, tab, o):
        bnd = (jnp.arange(N_CHUNKS * BSTRIDE, dtype=jnp.float32)
               / jnp.float32(BSTRIDE))
        return pl.pallas_call(
            kernel, grid_spec=grid_spec, interpret=INTERPRET,
            out_shape=jax.ShapeDtypeStruct((TILES, S, L), jnp.float32),
        )(wl, cnt, tab, bnd, o)

    return call


def _wrap(kernel):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(TILES,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),   # chunk table in HBM
            # o is [1, S, L]: its ONLY valid block index is 0 — an index
            # map of (t, 0, 0) DMAs out of bounds for t >= 1 and ABORTS
            # the device (this, not the HBM operand, was the round-3
            # scaffold's crash).
            pl.BlockSpec((1, S, L), lambda t, wl, cnt: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, S, L), lambda t, wl, cnt: (t, 0, 0),
                               memory_space=pltpu.VMEM),
    )

    @jax.jit
    def call(wl, cnt, tab, o):
        return pl.pallas_call(
            kernel, grid_spec=grid_spec, interpret=INTERPRET,
            out_shape=jax.ShapeDtypeStruct((TILES, S, L), jnp.float32),
        )(wl, cnt, tab, o)

    return call


def make_pipe_call():
    """The production scheme: grid (tiles, chunks), BlockSpec streaming."""
    n_chunks = N_CHUNKS

    def kernel(wl_ref, cnt_ref, tab_ref, o_ref, out_ref, acc_ref):
        t = pl.program_id(0)
        c = pl.program_id(1)
        o = o_ref[0]

        @pl.when(c == 0)
        def _():
            acc_ref[0] = jnp.zeros((S, L), jnp.float32)

        @pl.when(c < cnt_ref[t])
        def _():
            acc_ref[0] = _fold(tab_ref, o, acc_ref[0])

        @pl.when(c == n_chunks - 1)
        def _():
            out_ref[0] = acc_ref[0]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(TILES, n_chunks),
        in_specs=[
            pl.BlockSpec((T, 128), lambda t, c, wl, cnt: (wl[t, c], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, L), lambda t, c, wl, cnt: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, S, L), lambda t, c, wl, cnt: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((1, S, L), jnp.float32)],
    )

    @jax.jit
    def call(wl, cnt, tab, o):
        return pl.pallas_call(
            kernel, grid_spec=grid_spec, interpret=INTERPRET,
            out_shape=jax.ShapeDtypeStruct((TILES, S, L), jnp.float32),
        )(wl, cnt, tab, o)

    return call


MAKERS = {
    "mindma": make_mindma_call,
    "dyndma": make_dyndma_call,
    "dbldma": make_dbldma_call,
    "emit": make_emit_call,
    "pipe": make_pipe_call,
    "smemdma": make_smemdma_call,
}


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


def run_variant(name):
    tab = jnp.asarray(
        np.random.default_rng(1).normal(size=(N_CHUNKS * T, 128)),
        jnp.float32)
    o = jnp.ones((1, S, L), jnp.float32)
    call = MAKERS[name]()
    # mindma/dyndma do exactly one chunk regardless of cnt; only report
    # the full-count row for them.
    avgs = (float(N_CHUNKS),) if name in ("mindma", "dyndma") else (
        0.0, 0.5, 2.0, float(N_CHUNKS))
    for avg in avgs:
        wl, cnt = worklist(avg)
        dt, s = bench(call, wl, cnt, tab, o)
        print(f"{name} avg_cnt={float(jnp.mean(cnt)):4.2f}: "
              f"{dt*1e3:7.3f} ms (sum {s:.0f})", flush=True)


def _device_healthy():
    """Probe device health in a THROWAWAY subprocess (an abort poisons the
    probing process too).  Must be a PALLAS program: after an abort, plain
    XLA ops come back minutes before pallas_call does — a trivial-op check
    reports healthy while every kernel launch still aborts (observed)."""
    r = subprocess.run(
        [sys.executable, "-c",
         "import jax, jax.numpy as jnp;"
         "from jax.experimental import pallas as pl;"
         "f=lambda r,o: o.__setitem__(slice(None), r[:]*2);"
         "x=jnp.ones((8,128), jnp.float32);"
         "y=pl.pallas_call(f, out_shape=jax.ShapeDtypeStruct((8,128),"
         "jnp.float32))(x);"
         "print(float(y.sum()))"],
        capture_output=True, text=True, timeout=600)
    return r.returncode == 0


def _wait_healthy(max_wait=600):
    t0 = time.time()
    while time.time() - t0 < max_wait:
        if _device_healthy():
            return True
        print(f"    (device unhealthy, waiting... {int(time.time()-t0)}s)",
              flush=True)
        time.sleep(45)
    return False


def main():
    if len(sys.argv) > 1:
        try:
            run_variant(sys.argv[1])
        except Exception:
            traceback.print_exc()
            sys.exit(1)
        return
    # pipe first: it is the production scheme and doubles as the control —
    # if it fails the device is sick, not the code.
    order = ("pipe",) + tuple(v for v in VARIANTS if v != "pipe")
    for name in order:
        if not _wait_healthy():
            print(f"{name}: SKIPPED (device never recovered)", flush=True)
            continue
        r = subprocess.run(
            [sys.executable, __file__, name], capture_output=True,
            text=True, timeout=1800)
        tail = (r.stdout + r.stderr).strip().splitlines()
        if r.returncode == 0:
            for ln in tail:
                if ln.startswith(name):
                    print(ln, flush=True)
        else:
            print(f"{name} FAILED (rc {r.returncode}); last lines:",
                  flush=True)
            for ln in tail[-15:]:
                print("   ", ln, flush=True)


if __name__ == "__main__":
    main()
