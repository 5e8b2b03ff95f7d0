"""Fused Pallas TPU kernel: CFO-rotate -> DFT (MXU) -> |.|^2 -> argmax.

The per-symbol detection stage is the RX hot loop (SURVEY §3.3/3.4).  The
jnp path materializes the rotated windows, the DFT spectra, and the power
array in HBM; this kernel keeps one (TILE_R, N) tile of symbol windows
resident in VMEM through rotation (VPU), the dense DFT (two MXU matmuls
against constant cos/sin matrices), magnitude, argmax, and the dB metrics —
HBM traffic drops to one read of the input windows plus tiny per-symbol
outputs.

Symbol windows are flattened to rows (B*S, N); the per-row rotation scalars
(rate, start) ride along as (rows, 1) columns.  Covers N <= 512 (SF7..SF9),
where the dense DFT matrices fit comfortably in VMEM next to the tiles;
larger SFs use the factorized jnp path (ops/dft.py).  Semantics identical
to ops/detect.py::detect_ri minus the fractional-bin/bin-phase outputs,
which only the 2-symbol estimator needs.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .dft import _dft_mats

__all__ = ["fused_rotate_detect", "PALLAS_MAX_N", "pallas_supported"]

PALLAS_MAX_N = 512


def pallas_supported(n: int, platform: str | None = None) -> bool:
    if platform is None:
        platform = jax.default_backend()
    return n <= PALLAS_MAX_N and platform == "tpu"


def _detect_kernel(zr_ref, zi_ref, rate_ref, start_ref, c_ref, s_ref,
                   idx_ref, pow_ref, pav_ref, *, n: int, scale: float):
    """One grid step: a (TILE_R, N) tile of flattened symbol windows."""
    zr = zr_ref[...]                                   # (TR, N)
    zi = zi_ref[...]
    rate = rate_ref[...]                               # (TR, 1)
    start = start_ref[...]                             # (TR, 1)

    i = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1).astype(jnp.float32)
    ph = start + rate * i                              # (TR, N)
    c = jnp.cos(ph)
    s = jnp.sin(ph)
    ar = zr * c - zi * s
    ai = zr * s + zi * c

    cm = c_ref[...]                                    # (N, N) cos DFT
    sm = s_ref[...]                                    # (N, N) sin DFT
    xr = (jnp.dot(ar, cm, preferred_element_type=jnp.float32)
          + jnp.dot(ai, sm, preferred_element_type=jnp.float32))
    xi = (jnp.dot(ai, cm, preferred_element_type=jnp.float32)
          - jnp.dot(ar, sm, preferred_element_type=jnp.float32))
    mag2 = xr * xr + xi * xi                           # (TR, N)

    idx = jnp.argmax(mag2, axis=-1, keepdims=True).astype(jnp.int32)
    max_val = jnp.max(mag2, axis=-1, keepdims=True)
    total = jnp.sum(mag2, axis=-1, keepdims=True)
    fund = jnp.sqrt(max_val)
    noise = jnp.sqrt(jnp.maximum(total - max_val, 0.0))
    idx_ref[...] = idx
    pow_ref[...] = 20.0 * jnp.log10(fund) - scale
    pav_ref[...] = 20.0 * jnp.log10(noise) - scale


def _pick_tile(rows: int, cap: int = 256) -> int:
    tile = min(cap, rows)
    while rows % tile:
        tile -= 1
    return max(tile, 1)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_rotate_detect(zr, zi, rate, start, *, interpret: bool = False):
    """Detect argmax bins of CFO-rotated symbol windows.

    Args:
      zr, zi: float32 (B, S, N) symbol windows (already dechirped/windowed).
      rate: float32 (B,) per-packet derotation rate (phy.cpp:202).
      start: float32 (B, S) per-symbol phase offsets (phy.cpp:218-219).

    Returns:
      (index (B,S) int32, power (B,S), power_avg (B,S)) matching
      ops/detect.py semantics.
    """
    b, s, n = zr.shape
    rows = b * s
    tile = _pick_tile(rows)
    scale = float(20.0 * np.log10(n))

    cmat, smat = _dft_mats(n)
    rate_rows = jnp.broadcast_to(rate[:, None], (b, s)).reshape(rows, 1)
    start_rows = start.reshape(rows, 1)

    row_spec = pl.BlockSpec((tile, n), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    col_spec = pl.BlockSpec((tile, 1), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    mat_spec = pl.BlockSpec((n, n), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    kernel = functools.partial(_detect_kernel, n=n, scale=scale)
    idx, pw, pav = pl.pallas_call(
        kernel,
        grid=(rows // tile,),
        in_specs=[row_spec, row_spec, col_spec, col_spec, mat_spec, mat_spec],
        out_specs=[col_spec, col_spec, col_spec],
        out_shape=[
            jax.ShapeDtypeStruct((rows, 1), jnp.int32),
            jax.ShapeDtypeStruct((rows, 1), jnp.float32),
            jax.ShapeDtypeStruct((rows, 1), jnp.float32),
        ],
        interpret=interpret,
    )(zr.reshape(rows, n), zi.reshape(rows, n), rate_rows, start_rows,
      jnp.asarray(cmat), jnp.asarray(smat))
    return (idx.reshape(b, s), pw.reshape(b, s), pav.reshape(b, s))
