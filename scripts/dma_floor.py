#!/usr/bin/env python3
"""Measured HBM / DMA bandwidth floors on the attached TPU chip.

The roofline numbers in PERF.md assumed a single ~800 GB/s HBM figure;
these probes measure what each *path* actually sustains, because they
differ by >3x and that difference decides which optimizations can pay:

 * ``xla write``      — two fresh (rows, n) f32 arrays materialized per
   iteration behind ``lax.optimization_barrier`` (pure XLA store path).
 * ``xla read+write`` — elementwise ``a + c`` materialized (XLA fusion
   traffic both directions).
 * ``pallas store 3d / 2d`` — store-only Pallas kernels writing the
   same bytes through the automatic pipeline as (P, s, n) 3-D blocks vs
   flat (P*s, n) 2-D blocks of the identical row-major buffer.
 * ``pallas fetch x1 / x2`` — input-DMA-only kernels (block fully
   fetched, 8 rows consumed) with one input stream vs two concurrent
   streams.

r5 measurements on the attached v5 lite chip (see PERF.md "Measured
DMA floors"): xla write 657, xla r+w ~1.2-1.4 TB/s aggregate, pallas
store 320 (3-D) / 650 (2-D), pallas fetch 362 (x1) / 494 (x2)
Gsamples.. GB/s.  Conclusions baked into the kernels: TX outputs use
2-D blocks where Mosaic's sublane rule allows (ops/pallas_tx.py), and
per-stream Pallas fetch — not "HBM speed" — is the right constant for
kernel input floors (ops/pallas_rx.py reads two streams concurrently).

Usage: python scripts/dma_floor.py  (uses the attached TPU; ~2 min)
"""
from __future__ import annotations

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS, N = 8192 * 72, 128        # ~302 MB per f32 plane
GB = ROWS * N * 4 / 1e9


def slope_time(loop, args, iters_short=4, target=1.0, cap=2048):
    float(loop(*args, iters_short))
    t0 = time.perf_counter()
    float(loop(*args, iters_short))
    short = time.perf_counter() - t0
    iters = int(min(cap, max(8, iters_short * target / max(short, 1e-6))))
    float(loop(*args, iters))
    t0 = time.perf_counter()
    float(loop(*args, iters))
    long = time.perf_counter() - t0
    return (long - short) / (iters - iters_short)


def xla_write():
    @jax.jit
    def loop(c0, iters):
        def body(_, c):
            x = lax.optimization_barrier(jnp.full((ROWS, N), 1.0,
                                                  jnp.float32) * c)
            y = lax.optimization_barrier(jnp.full((ROWS, N), 2.0,
                                                  jnp.float32) * c)
            return (jnp.sum(x[:1, :1]) + jnp.sum(y[:1, :1])) * 1e-30
        return lax.fori_loop(0, iters, body, c0)
    return 2 * GB / slope_time(loop, (jnp.float32(1),))


def xla_read_write():
    a = jnp.ones((ROWS, N), jnp.float32)
    b = jnp.ones((ROWS, N), jnp.float32)

    @jax.jit
    def loop(c0, iters):
        def body(_, c):
            x = lax.optimization_barrier(a + c * 1e-30)
            y = lax.optimization_barrier(b + c * 1e-30)
            return jnp.sum(x[:1, :1]) * 1e-30 + jnp.sum(y[:1, :1]) * 0
        return lax.fori_loop(0, iters, body, c0)
    return 4 * GB / slope_time(loop, (jnp.float32(0),))   # r 2GB + w 2GB


def pallas_store(flat: bool):
    p_tile, s = 16, 72
    blk = p_tile * s
    grid = ROWS // blk

    if flat:
        def kern(t_ref, re_ref, im_ref):
            v = t_ref[0, 0].astype(jnp.float32)
            re_ref[...] = jnp.full((blk, N), 1.0, jnp.float32) * v
            im_ref[...] = jnp.full((blk, N), 2.0, jnp.float32) * v
        ospec = pl.BlockSpec((blk, N), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
        oshape = jax.ShapeDtypeStruct((ROWS, N), jnp.float32)
    else:
        def kern(t_ref, re_ref, im_ref):
            v = t_ref[0, 0].astype(jnp.float32)
            re_ref[...] = jnp.full((p_tile, s, N), 1.0, jnp.float32) * v
            im_ref[...] = jnp.full((p_tile, s, N), 2.0, jnp.float32) * v
        ospec = pl.BlockSpec((p_tile, s, N), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)
        oshape = jax.ShapeDtypeStruct((ROWS // s, s, N), jnp.float32)

    @jax.jit
    def loop(t0, iters):
        tspec = pl.BlockSpec((8, 128), lambda i: (0, 0),
                             memory_space=pltpu.VMEM)

        def body(_, t):
            re, _ = pl.pallas_call(
                kern, grid=(grid,), in_specs=[tspec],
                out_specs=[ospec, ospec], out_shape=[oshape, oshape])(t)
            first = re[:1, :1] if flat else re[:1, :1, :1]
            return t + (jnp.sum(first) * 1e-30).astype(t.dtype)
        return jnp.sum(lax.fori_loop(0, iters, body, t0))
    return 2 * GB / slope_time(loop, (jnp.zeros((8, 128), jnp.int32),))


def pallas_fetch(streams: int):
    blk = 1152 // streams
    rows = ROWS // streams
    grid = rows // blk
    ispec = pl.BlockSpec((blk, N), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec((8, N), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    oshape = jax.ShapeDtypeStruct((grid * 8, N), jnp.float32)

    if streams == 1:
        def kern(a_ref, o_ref):
            o_ref[...] = a_ref[0:8, :] + 1.0
    else:
        def kern(a_ref, b_ref, o_ref):
            o_ref[...] = a_ref[0:8, :] + b_ref[0:8, :]
    arrs = [jnp.ones((rows, N), jnp.float32) for _ in range(streams)]

    @jax.jit
    def loop(c0, iters):
        def body(_, c):
            o = pl.pallas_call(kern, grid=(grid,),
                               in_specs=[ispec] * streams,
                               out_specs=ospec, out_shape=oshape)(*arrs)
            return c + jnp.sum(o[:1, :1]) * 1e-30
        return lax.fori_loop(0, iters, body, c0)
    return streams * rows * N * 4 / 1e9 / slope_time(loop, (jnp.float32(0),))


def main():
    if jax.default_backend() not in ("tpu", "axon"):
        print("dma_floor: needs the attached TPU", file=sys.stderr)
        return 1
    rows = [
        ("xla write-only", xla_write()),
        ("xla read+write (a+c)", xla_read_write()),
        ("pallas store 3-D blocks", pallas_store(flat=False)),
        ("pallas store 2-D blocks", pallas_store(flat=True)),
        ("pallas input fetch x1", pallas_fetch(1)),
        ("pallas input fetch x2 aggregate", pallas_fetch(2)),
    ]
    for name, bw in rows:
        print(f"{name}: {bw:,.0f} GB/s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
