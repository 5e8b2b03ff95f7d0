"""Fused Pallas TPU RX kernel: timing-shift -> dechirp/window -> DFT -> argmax.

This is the whole per-symbol RX hot path (reference ``src/phy/phy.cpp:206-231``
and ``src/phy/LoRaDemod.cpp:142-165``) in ONE kernel.  The jnp path pays two
full HBM round-trips that this kernel deletes:

 * the per-packet timing shift (``phy.cpp:210-216``) materializes a shifted
   copy of the stream (measured 73 ms of a 95 ms sf7 demod on TPU v5e);
 * the (B, S, N) symbol windows are written to HBM and re-read by the
   detection kernel.

Here each grid step streams P packets' samples HBM->VMEM through the
automatic block pipeline, applies the per-packet timing shift *in VMEM* (a
dynamic sublane roll + a dynamic lane roll + one select — no gather, and
dynamic roll amounts need no alignment proofs), multiplies by the combined
normalization * down-chirp * window rotation, runs the DFT on the MXU, and
reduces to per-symbol (argmax bin, power dB, noise dB).  HBM traffic is one
read of the stream plus three (B, S) vectors out.

DFT strategy (ops/dft.py semantics, in-kernel — see ``_dft_mode``):
 * N <= 512 (dense): (N, N) cos/sin matrices; P packets' windows share one
   (P*S, N) x (N, N) complex matmul so the MXU sees full tiles even at SF7.
 * 1024 <= N <= 16384 (hybrid): log2(N/128) radix-2 DIF passes on the VPU —
   every roll/select is lane-tile aligned, no transposes — then ONE
   full-width (rows*N/128, 128) x (128, 128) MXU matmul over all blocks.
   First-max argmax in natural frequency order rides a static permuted
   index constant (bit-reversed block map), preserving the reference's
   lowest-index tie rule (``LoRaDetector.hpp:53``).  Replaced the r2/r3
   two-stage matmul factorization at every size it ran (sf10 packet path
   140 -> 115 ns/sym; 16384-bin wide detection 4.8 -> 3.7 us/sym at sf12,
   measured on-chip), so that path was removed.

Oversampling (osr > 1) rides the same kernel: the caller splits the stream
into its ``osr`` decimation-phase copies (a reshape — total HBM bytes are
unchanged), and the kernel picks each packet's phase ``t_off mod osr``
in VMEM (the reference decimates at the timing-shifted base,
``phy.cpp:218-229``, so the phase is per-packet dynamic); the row/lane roll
then runs in the decimated domain with shift ``floor(t_off / osr)``.  The
edge-clamp rows come from the phase-0 slab — the reference's clamp falls
back to the *unshifted* base (``phy.cpp:209-216``), which decimates at
phase 0.

The wide receiver (``models/modem.py::demodulate_wide``) reuses this kernel
at full rate: its (N*osr)-point detection IS the osr == 1 kernel with
``n = N*osr`` (hybrid DFT, up to 7 DIF passes at 16384), so BW-250/500
packets never fall back to jnp either.

The timing-shift clamp semantics match ``phy.cpp:209-216`` exactly: with
|t_off| <= step, symbol 0 falls back to its unshifted window when
t_off < 0 and symbol S-1 when t_off > 0.
"""
from __future__ import annotations

import functools
import os

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .dft import _dft_mats

__all__ = ["rx_window_detect", "rx_supported", "PALLAS_RX_MAX_N",
           "PALLAS_RX_MAX_WIDE"]

PALLAS_RX_MAX_N = 4096          # decimated detection size (2^sf)
PALLAS_RX_MAX_WIDE = 16384      # full-rate wide detection size (2^sf * osr)


_VMEM_BUDGET = 15 * 1024 * 1024     # leave headroom below the ~16 MiB VMEM

_ABLATE: set = set()    # perf-dissection knob (tests/bench only): flags
                        # {"nocopy", "noshift", "norot", "nodft"} gut kernel
                        # stages to attribute time; results are WRONG.  Read
                        # once per call in rx_window_detect and threaded into
                        # _rx_call as a *static jit argument*, so every
                        # ablation state compiles its own executable and a
                        # previously-compiled ablated variant can never leak
                        # into non-ablated calls (ADVICE r4 #1).


def _table_bytes(ndft: int) -> int:
    """Resident DFT-constant bytes by _dft_mode (dense cos/sin pairs, or
    hybrid base tables + twiddle rows + nat map)."""
    if ndft <= 512:
        return 2 * ndft * ndft * 4
    passes = (ndft // _HYBRID_BASE).bit_length() - 1
    return (2 * _HYBRID_BASE * _HYBRID_BASE * 4
            + 2 * passes * ndft * 4 + ndft * 4)


def _vmem_ok(ndft: int, osr_k: int, s_real: int,
             s_detect: int | None = None) -> bool:
    """Peak VMEM estimate of one grid step fits the scoped limit.

    Model calibrated against Mosaic's scoped-vmem accounting: the two
    slab planes are double-buffered by the automatic pipeline (4x one
    plane) and the DFT holds live (rows, ndft) f32 temporaries (ar/ai
    scratch + DIF roll/butterfly temps + stage outputs) plus the
    resident constant tables.  Six live rows-units are validated
    on-chip through ndft = 4096 (Mosaic reuses the per-pass roll temps).
    Above 4096 the r5 in-place slice-form DIF passes (_dft_mag_argmax)
    update the ar/ai scratch directly, collapsing the live set to ~2
    units: measured via scripts/wide_chunk_probe.py on-chip — at 16384
    bins s_real = 26/s_detect = 24 compiles and runs (the r4 model's
    10-unit estimate rejected anything past 8 rows) while s_real = 34
    ooms, and at 8192 bins s_real = 66 runs; 2 units + the 15 MiB
    budget reproduce exactly that boundary.  The DFT rows scale with
    ``s_detect`` (detected rows), the slab with ``s_real`` (stream rows
    incl. chunk halos)."""
    if s_detect is None:
        s_detect = s_real
    s_pad = _round_up(max(s_detect, 1), 8)
    p_tile = _packets_per_tile(ndft)
    rows_unit = p_tile * s_pad * ndft * 4
    live_units = 6 if ndft <= 4096 else 2
    if osr_k == 1 and _direct_windows(ndft) and ndft > 4096:
        # direct-roll form above 4096 (wide chunks): in-spec planes are
        # the raw (s_real, ndft) blocks, no slab scratch.  The automatic
        # pipeline's buffer count is *context dependent*: a 16384-bin
        # s_real = 24 config compiled at batch 16 but oomed at batch 32,
        # and the same shapes oomed or not depending on the surrounding
        # XLA program (r5 probes) — so budget 8 plane-units to stay
        # clear of the cliff in every observed context (chunk 14
        # composes at 2.2 us/sym vs the r4 chunk-6 2.8, while chunk 22
        # sat on the cliff).
        plane = p_tile * max(s_real, 1) * ndft * 4
        return (8 * plane + live_units * rows_unit + _table_bytes(ndft)
                < _VMEM_BUDGET)
    # <= 4096 (both osr == 1 forms) and all osr > 1: the r4-calibrated
    # slab accounting, validated on-chip through every packet config —
    # srows-based planes over-count the in-spec buffering by about what
    # the uncounted 2 x (srows, ndft) slab scratch adds (an sf12 66-row
    # config that double-counting rejected fell back to the jnp path
    # and cost 5x, r5).  The direct form's osr == 1 in-spec block is the
    # SAME (p_tile, 1, s_real, n) plane the slab form streams, and it
    # drops the slab's 2 x (srows, n) scratch — strictly less VMEM — so
    # any config this model admits for the slab form is safe for the
    # direct form too (on-chip confirmed at the sf12 66-row config the
    # 8-plane wide model wrongly rejected, r5: 33.1k pps direct vs
    # 32.2k slab).
    srows = _round_up(_round_up(max(s_real, 1), 8) + 3, 8)
    slab_plane = p_tile * max(osr_k, 1) * srows * ndft * 4
    return (4 * slab_plane + live_units * rows_unit + _table_bytes(ndft)
            < _VMEM_BUDGET)


def rx_supported(n: int, osr: int, platform: str | None = None,
                 s_real: int = 8) -> bool:
    """True when the fused kernel covers this (decimated) configuration."""
    if platform is None:
        platform = jax.default_backend()
    return (osr <= 8 and n <= PALLAS_RX_MAX_N and platform == "tpu"
            and _vmem_ok(n, osr, s_real))


def wide_supported(n: int, osr: int, platform: str | None = None,
                   s_real: int = 8, s_detect: int | None = None) -> bool:
    """True when the full-rate wide detection (n*osr bins) fits the kernel.

    ``s_real`` counts stream symbol rows per call (halos included);
    ``s_detect`` the rows actually detected (chunk halos excluded — they
    only size the slab, not the DFT scratch)."""
    if platform is None:
        platform = jax.default_backend()
    return (n * osr <= PALLAS_RX_MAX_WIDE and platform == "tpu"
            and _vmem_ok(n * osr, 1, s_real, s_detect))


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _packets_per_tile(n: int) -> int:
    """Packets per grid step: enough rows that the dense DFT matmul fills
    MXU tiles (P * S_pad rows >= ~1024 for SF7) while slabs stay small."""
    return max(1, 2048 // n)


def _dft_mode(n: int) -> str:
    """In-kernel DFT strategy by size.

    * ``dense``  (n <= 512): one (n, n) matmul, full MXU.
    * ``hybrid`` (1024 <= n <= 16384): log2(n/128) radix-2 DIF passes on
      the VPU (lane-tile-aligned rolls + selects, no transposes), then a
      full-width (rows*n1, 128) x (128, 128) MXU matmul.  Replaces the
      r2/r3 two-matmul digit factorization at every size it ran: at
      1024-4096 that path's stage-1 operand was only n/128 in {8,16,32}
      rows (MXU ~6% occupied, two sublane transposes — the r3 sf10
      cliff: 140 ns/sym vs sf9's 53 for 2x the samples); at 16384 (the
      wide receiver) hybrid measured 3.7 vs 4.8 us/sym on-chip.
    """
    if n <= 512:
        return "dense"
    assert n <= 16384, n
    return "hybrid"


_HYBRID_BASE = 128      # final-block DFT size: dense (128, 128) MXU matmul


@functools.lru_cache(maxsize=None)
def _hybrid_consts(n: int):
    """Host constants for the hybrid DIF + dense-base-DFT path.

    Returns (twr, twi, nat): ``twr/twi`` (passes, n) float32 — pass s's
    full-width twiddle row holds 1+0j on even (sum) halves and
    W_b^{local-h} = exp(-2*pi*i*(local-h)/b) on odd (difference) halves
    (b = n >> s, h = b/2); ``nat`` (1, n) float32 maps the post-pass lane
    position t*base + m to its natural frequency m*n1 + bitrev(t), so the
    reference's lowest-index tie rule (LoRaDetector.hpp:53) survives the
    bit-reversed block order without any data movement (float-typed so
    the in-kernel idx path never touches int vectors — Mosaic cannot
    legalize int relayouts/converts for the row-layout output store;
    bin values < 2^14 are exact in f32).  Base 128 measured
    faster than 512 on-chip (sf10 119 vs 146 ns/sym): the extra MXU
    passes of a 512-point base cost more than the two extra VPU DIF
    passes they save.
    """
    base = _HYBRID_BASE
    n1 = n // base
    passes = int(np.log2(n1))
    p = np.arange(n)
    twr = np.zeros((passes, n), np.float32)
    twi = np.zeros((passes, n), np.float32)
    b = n
    for s in range(passes):
        h = b // 2
        local = p % b
        j = local - h
        odd = local >= h
        ang = -2.0 * np.pi * j / b
        twr[s] = np.where(odd, np.cos(ang), 1.0).astype(np.float32)
        twi[s] = np.where(odd, np.sin(ang), 0.0).astype(np.float32)
        b = h
    t = p // base
    m = p % base
    rev = np.zeros(n1, np.int64)
    for i in range(n1):
        r = 0
        v = i
        for _ in range(passes):
            r = (r << 1) | (v & 1)
            v >>= 1
        rev[i] = r
    nat = (m * n1 + rev[t]).astype(np.float32).reshape(1, n)
    return twr, twi, nat


# DIF pass strategy crossover: pass s (2^s blocks) uses the per-block
# static-slice form while 2^s <= this, the full-width roll+select form
# above it.  The slice form does ~5 VPU ops/element (2 slice reads,
# add/sub, twiddle on the odd half only) vs ~18 for roll+select (2
# rolls/component, both branches computed full-width, masks, selects),
# but emits 4 stores per block, so it loses once blocks are many and
# narrow.  Tuned on-chip via scripts/dif_tune.py (TPU v5e, r5): see
# PERF.md.  Import-time knob only — it is read at trace time, so
# changing it after a config has compiled has no effect in-process.
_SLICE_MAXB = int(os.environ.get("LORA_DIF_SLICE_MAXB", "16"))


def _slice_passes(n: int) -> int:
    """Number of leading DIF passes that use the per-block slice form."""
    if _SLICE_MAXB < 1:
        return 0
    passes = (n // _HYBRID_BASE).bit_length() - 1
    return min(passes, _SLICE_MAXB.bit_length())


@functools.lru_cache(maxsize=None)
def _slice_tw_consts(n: int, k: int):
    """Compact block twiddle rows for the k leading slice-form passes.

    Pass s combines blocks of b = n >> s: one (1, b/2) row of
    W_b^j = exp(-2*pi*i*j/b), shared by every block of the pass.  Kept
    as standalone (1, h) kernel inputs (not slices of the full-width
    (passes, n) rows): Mosaic assigns offset-0 layouts to whole inputs,
    while sublane/lane-offset slices of a loaded constant hit
    unsupported relayout broadcasts on-chip (r5 measurement).
    """
    out = []
    b = n
    for s in range(k):
        h = b // 2
        ang = -2.0 * np.pi * np.arange(h) / b
        out.append(np.cos(ang, dtype=np.float64).astype(np.float32)
                   .reshape(1, h))
        out.append(np.sin(ang, dtype=np.float64).astype(np.float32)
                   .reshape(1, h))
        b = h
    return out


def _dft_mag_argmax(ar_ref, ai_ref, mats, n: int, rows: int, mode: str):
    """In-kernel DFT -> |bin|^2 -> (first-max idx, max, total) reduction.

    ``ar_ref``/``ai_ref`` are (rows, n) VMEM refs holding the dechirped
    windows (the hybrid path's early DIF passes update them in place);
    ``mats`` are the loaded DFT constant arrays (dense: [cos, sin]; hybrid:
    [c128, s128, twr, twi, nat]).  Shared by the packet RX kernel and the
    streaming-scan kernel — identical math, identical lowest-index tie
    rule (LoRaDetector.hpp:53).  Returns (idx, max_val, total) each
    (rows, 1).
    """
    if mode == "dense":
        ar = ar_ref[...]
        ai = ai_ref[...]
        cm, sm = mats
        xr = (jnp.dot(ar, cm, preferred_element_type=jnp.float32)
              + jnp.dot(ai, sm, preferred_element_type=jnp.float32))
        xi = (jnp.dot(ai, cm, preferred_element_type=jnp.float32)
              - jnp.dot(ar, sm, preferred_element_type=jnp.float32))
        mag2 = xr * xr + xi * xi                     # (rows, n) natural order
        max_val = jnp.max(mag2, axis=-1, keepdims=True)
        total = jnp.sum(mag2, axis=-1, keepdims=True)
        # first-max as a float min over hit lanes (== argmax's first-
        # occurrence rule); idx stays f32 in-kernel — bin values < 2^14
        # are exact, and int relayouts/converts don't legalize in
        # Mosaic for the (rows, 1) -> (1, rows) output transpose
        lane_f = lax.broadcasted_iota(jnp.int32, (1, n), 1).astype(
            jnp.float32)
        hit = mag2 == max_val
        idx = jnp.min(jnp.where(hit, lane_f, np.float32(n)), axis=-1,
                      keepdims=True)
        return idx, max_val, total

    assert mode == "hybrid", mode
    # radix-2 DIF passes down to base-point blocks, two interchangeable
    # per-pass forms with bit-identical arithmetic (same operands, same
    # order — only the data movement differs):
    #  * slice form (early passes, few blocks): per block, static
    #    lane-tile-aligned slices lo/hi, write back lo+hi and
    #    (lo-hi)*W in place — no rolls, no masks, twiddle work on half
    #    the lanes only;
    #  * roll form (late passes, many blocks): full-width rolls +
    #    select, block-count independent.
    cm, sm, twr_all, twi_all, nat_c = mats[:5]
    slice_tw = mats[5:]
    base = _HYBRID_BASE
    n1 = n // base
    passes = n1.bit_length() - 1
    b = n
    s = 0
    while 2 * s < len(slice_tw):
        h = b // 2
        twr = slice_tw[2 * s]                     # (1, h) block twiddle row
        twi = slice_tw[2 * s + 1]
        for k in range(1 << s):
            a0 = k * b
            lo_r = ar_ref[:, a0:a0 + h]
            lo_i = ai_ref[:, a0:a0 + h]
            hi_r = ar_ref[:, a0 + h:a0 + b]
            hi_i = ai_ref[:, a0 + h:a0 + b]
            dr = lo_r - hi_r
            di = lo_i - hi_i
            ar_ref[:, a0:a0 + h] = lo_r + hi_r
            ai_ref[:, a0:a0 + h] = lo_i + hi_i
            ar_ref[:, a0 + h:a0 + b] = dr * twr - di * twi
            ai_ref[:, a0 + h:a0 + b] = dr * twi + di * twr
        b = h
        s += 1
    lane = lax.broadcasted_iota(jnp.int32, (1, n), 1)
    xr = ar_ref[...]
    xi = ai_ref[...]
    for s in range(s, passes):
        h = b // 2
        even = lax.rem(lane, b) < h               # (1, n) mask
        fr = pltpu.roll(xr, n - h, axis=1)        # [p] -> x[p + h]
        fi = pltpu.roll(xi, n - h, axis=1)
        br_ = pltpu.roll(xr, h, axis=1)           # [p] -> x[p - h]
        bi_ = pltpu.roll(xi, h, axis=1)
        twr = twr_all[s][None, :]
        twi = twi_all[s][None, :]
        dr = br_ - xr
        di = bi_ - xi
        xr = jnp.where(even, xr + fr, dr * twr - di * twi)
        xi = jnp.where(even, xi + fi, dr * twi + di * twr)
        b = h
    # base-point DFTs of all blocks at once: full-MXU matmul
    zr = xr.reshape(rows * n1, base)
    zi = xi.reshape(rows * n1, base)
    yr = (jnp.dot(zr, cm, preferred_element_type=jnp.float32)
          + jnp.dot(zi, sm, preferred_element_type=jnp.float32))
    yi = (jnp.dot(zi, cm, preferred_element_type=jnp.float32)
          - jnp.dot(zr, sm, preferred_element_type=jnp.float32))
    mag2 = (yr * yr + yi * yi).reshape(rows, n)   # bit-reversed blocks
    max_val = jnp.max(mag2, axis=-1, keepdims=True)
    total = jnp.sum(mag2, axis=-1, keepdims=True)
    # first-max in natural frequency order via the static nat map
    # (float-typed — see the dense branch note on in-kernel int idx)
    hit = mag2 == max_val
    idx = jnp.min(jnp.where(hit, nat_c, np.float32(n)), axis=-1,
                  keepdims=True)
    return idx, max_val, total


def _dft_const_arrays(n: int, mode: str):
    """Host DFT constant arrays for the in-kernel DFT (by _dft_mode)."""
    if mode == "hybrid":
        cm, sm = map(jnp.asarray, _dft_mats(_HYBRID_BASE))
        twr, twi, nat = _hybrid_consts(n)
        return ([cm, sm, jnp.asarray(twr), jnp.asarray(twi),
                 jnp.asarray(nat)]
                + [jnp.asarray(a) for a in
                   _slice_tw_consts(n, _slice_passes(n))])
    cm, sm = map(jnp.asarray, _dft_mats(n))
    return [cm, sm]


def _shifted_windows(slab, slab0, t, q, qm, srows, ndft, s_pad, s_real,
                     h0=0):
    """Timing-shifted windows of one packet's slab (phy.cpp:209-216).

    ``slab`` is the packet's decimation-phase-``t mod osr`` plane
    (SROWS, ndft); row r covers decimated samples [(r-1)*ndft, r*ndft);
    window s starts at decimated sample s*ndft + q (q = floor(t/osr)),
    i.e. slab[s + 1 + rowoff, qm + j] spilling into the following row.
    One sublane roll + one lane roll + one select.  ``slab0`` is the
    phase-0 plane: the reference's edge clamp falls back to the
    *unshifted* base (phy.cpp:209-216), which decimates at phase 0.

    ``h0`` skips the first h0 stream rows: windows emitted are
    s = h0 .. h0 + s_pad - 1 (the chunked wide receiver's lead halo —
    rows that only provide neighbor samples, not detections).  The edge
    clamp keys on the *stream* row index, so packet-edge semantics
    survive chunking: interior chunks (halos on both sides) never hit
    stream rows 0 / s_real-1 inside the emitted range.
    """
    rowoff = (q - qm) // ndft                       # floor(q/ndft): -1|0|1
    lane_shift = lax.rem(ndft - qm, ndft)
    row_shift = lax.rem(srows - (1 + rowoff + h0), srows)
    r = pltpu.roll(pltpu.roll(slab, row_shift, axis=0), lane_shift, axis=1)
    j = lax.broadcasted_iota(jnp.int32, (s_pad, ndft), 1)
    w = jnp.where(j < ndft - qm, r[0:s_pad], r[1:1 + s_pad])
    # edge clamp: symbol 0 unshifted when t<0, symbol s_real-1 when t>0
    row = h0 + lax.broadcasted_iota(jnp.int32, (s_pad, ndft), 0)
    clamp = ((row == 0) & (t < 0)) | ((row == s_real - 1) & (t > 0))
    return jnp.where(clamp, slab0[1 + h0:1 + h0 + s_pad], w)


_DIRECT_MIN = int(os.environ.get("LORA_RX_DIRECT_MIN", "1"))


def _direct_windows(ndft: int) -> bool:
    """osr==1 window-extraction strategy: the direct form (windows
    spliced straight off the raw block, one circular row+lane roll per
    component, "next row" as a static slice) wins at EVERY size since
    the r5 b-from-a slice halved its roll count — on-chip A/B vs the
    slab form (copy into a halo'd (srows, n) scratch + one double-rotate
    + splice): sf7 1,004k vs 973k pps, sf8 571k vs 556k, sf9 297k vs
    284k, sf10 136k vs 132k, sf11 67.8k vs 66.7k, sf12 33.1k vs 32.2k.
    (Before that change the slab form won at packet sizes — its copy was
    cheaper than the direct form's then-two double-rotates.)  The direct
    form's deleted 2 x (srows, n) VMEM scratch is also what lets
    16384-bin wide chunks grow 6 -> 14 rows (2.8 -> 2.2 us/sym composed,
    r5).  The slab form remains the osr > 1 path (decimation-phase
    slabs) and as this A/B knob: LORA_RX_DIRECT_MIN (import-time)."""
    return ndft >= _DIRECT_MIN


def _shifted_windows_direct(v, t, q, qm, s_real, ndft, rows_out, h0, h1):
    """Timing-shifted windows straight from the raw (s_real, ndft) block
    (osr == 1), without assembling a halo'd slab: ONE circular row+lane
    roll per component splices each window from its two source rows —
    the "next row" operand ``b[i] = a[(i+1) mod sp8]`` is a static slice
    of the rolled plane (both are circular rolls of the same block, so
    the identity holds bit-exactly including the wrap row; this halved
    the r5 direct form's roll count).  Out-of-range row reads wrap
    circularly into garbage rows, but every window that reads one is
    exactly a window the reference's edge clamp overwrites
    (phy.cpp:209-216: symbol 0 falls back to unshifted when t < 0,
    symbol s_real-1 when t > 0), so the clamp both enforces reference
    semantics AND masks the wrap — the r4 slab copy + halo-row zeroing
    (2 x (srows, n) VMEM scratch + one full copy traversal per packet)
    is deleted.  Interior chunks of the chunked wide receiver
    (h0 == h1 == 1) never emit stream rows 0 / s_real-1, so they compile
    with no clamp select at all.  Emits stream rows [h0, h0+rows_out).
    """
    rowoff = (q - qm) // ndft                       # floor(q/ndft): -1|0|1
    lane_shift = lax.rem(ndft - qm, ndft)
    # Mosaic's dynamic sublane rotate needs an 8-aligned row count: pad
    # the block with zero rows up to the sublane tile.  The circle then
    # runs mod sp8 instead of mod s_real — the wrapped/pad rows are
    # garbage either way, and only clamped/discarded windows read them.
    sp8 = _round_up(s_real, 8)
    if sp8 > s_real:
        z = jnp.zeros((sp8 - s_real, ndft), v.dtype)
        v = jnp.concatenate([v, z], axis=0)
    k1 = lax.rem(sp8 - (h0 + rowoff), sp8)          # a[i] = v[i + h0 + rowoff]
    a = pltpu.roll(pltpu.roll(v, k1, axis=0), lane_shift, axis=1)
    if rows_out + 1 <= sp8:
        b = a[1:rows_out + 1]                       # b[i] = a[i + 1]
    else:                                           # rows_out == sp8: wrap row
        b = jnp.concatenate([a[1:sp8], a[0:1]], axis=0)
    j = lax.broadcasted_iota(jnp.int32, (rows_out, ndft), 1)
    w = jnp.where(j < ndft - qm, a[0:rows_out], b[0:rows_out])
    if h0 == 0 or h1 == 0:
        row = h0 + lax.broadcasted_iota(jnp.int32, (rows_out, ndft), 0)
        clamp = ((row == 0) & (t < 0)) | ((row == s_real - 1) & (t > 0))
        vs = v if h0 == 0 else pltpu.roll(v, sp8 - h0, axis=0)
        w = jnp.where(clamp, vs[0:rows_out], w)
    return w


def _rx_kernel(t_ref, rate_ref, scale_ref, sr_ref, si_ref, mr_ref, mi_ref,
               *mat_out_refs, n: int, osr: int, s_pad: int, s_real: int,
               p_tile: int, mode: str, padded: bool, h0: int = 0,
               h1: int = 0, ablate: frozenset = frozenset()):
    """One grid step = ``p_tile`` packets.

    t/rate/scale: whole (B,) arrays in SMEM, indexed b = step*P + p.
    sr/si: decimation-phase slabs — pre-padded (P, osr, SROWS, n) when
    ``padded`` (osr > 1), else the raw (P, 1, s_real, n) stream (a free
    bitcast of the caller's buffer: the halo'd slab is assembled in VMEM
    scratch instead, deleting two full HBM pad/relayout passes per plane
    that cost more than the kernel itself).
    mr/mi: (1, n) combined down-chirp * window multiplier.
    mat_out_refs: DFT constants, VMEM scratch, then the three outputs
    (idx, pow, pav) each (P, s_pad, 1).
    ``h0``: lead rows to skip (chunked wide receiver halos — they feed
    the slab but are not detected; s_pad covers only detected rows).
    """
    n_mats = 2 if mode == "dense" else 5 + 2 * _slice_passes(n)
    mat_refs = mat_out_refs[:n_mats]
    (idx_ref, pow_ref, pav_ref, ar_scr, ai_scr,
     *slab_scr) = mat_out_refs[n_mats:]

    direct = (not padded) and _direct_windows(n)
    if padded or direct:
        lph_scr, rph_scr = slab_scr
        srows = sr_ref.shape[2] if padded else s_real
    else:
        lph_scr, rph_scr, sl_r, sl_i = slab_scr
        srows = sl_r.shape[0]
        # zero the halo rows once per grid step; the p-loop only ever
        # rewrites rows 1..1+s_real
        zrow = jnp.zeros((1, n), jnp.float32)
        sl_r[0:1] = zrow
        sl_i[0:1] = zrow
        for r in range(1 + s_real, srows):
            sl_r[r:r + 1] = zrow
            sl_i[r:r + 1] = zrow
    rows_out = min(s_pad, s_real)    # direct path: stored window rows
    g = pl.program_id(0)
    mr = mr_ref[0][None, :]
    mi = mi_ref[0][None, :]
    i_lane = lax.broadcasted_iota(jnp.int32, (1, n), 1).astype(jnp.float32)
    s_col = lax.broadcasted_iota(jnp.int32, (s_pad, 1), 0).astype(jnp.float32)

    # Pass 1 (per packet): window extraction only — phase select, the
    # timing-shift rolls/splice/clamp — plus stores of the separable
    # rotation *phases*.  All transcendentals and the complex rotation
    # multiplies run batched over every packet afterwards: per-packet
    # (1, n) trig occupied 1/8 of a vreg row tile and was the dominant
    # serialized VPU cost between MXU calls (VERDICT r3 weak #2).
    for p in range(p_tile):
        b = g * p_tile + p
        t = t_ref[b]
        # decimated-domain shift q and per-packet decimation phase ph_sel:
        # oversampled index s*step + t + i*osr == osr*(s*n + q + i) + ph_sel
        tm_os = lax.rem(lax.rem(t, osr) + osr, osr) if osr > 1 else 0
        q = (t - tm_os) // osr if osr > 1 else t
        qm = lax.rem(lax.rem(q, n) + n, n)
        if "nocopy" in ablate:
            # raw block -> windows scratch directly, no shift/splice work
            ar_scr[p * s_pad:p * s_pad + rows_out, :] = sr_ref[p, 0][0:rows_out]
            ai_scr[p * s_pad:p * s_pad + rows_out, :] = si_ref[p, 0][0:rows_out]
            rate = rate_ref[b]
            t_frac = t.astype(jnp.float32) * np.float32(1.0 / osr)
            rph_scr[p * s_pad:(p + 1) * s_pad] = (
                rate * (s_col * np.float32(n) + t_frac))
            lph_scr[p:p + 1] = rate * i_lane
            continue
        if padded:
            slab_r0 = sr_ref[p, 0]
            slab_i0 = si_ref[p, 0]
            slab_r, slab_i = slab_r0, slab_i0
            for ph_sel in range(1, osr):             # VMEM phase select
                take = tm_os == ph_sel
                slab_r = jnp.where(take, sr_ref[p, ph_sel], slab_r)
                slab_i = jnp.where(take, si_ref[p, ph_sel], slab_i)
            if "noshift" in ablate:
                wr = slab_r[1 + h0:1 + h0 + s_pad]
                wi = slab_i[1 + h0:1 + h0 + s_pad]
            else:
                wr = _shifted_windows(slab_r, slab_r0, t, q, qm, srows, n,
                                      s_pad, s_real, h0)
                wi = _shifted_windows(slab_i, slab_i0, t, q, qm, srows, n,
                                      s_pad, s_real, h0)
            ar_scr[p * s_pad:(p + 1) * s_pad, :] = wr
            ai_scr[p * s_pad:(p + 1) * s_pad, :] = wi
        elif direct:
            # osr == 1: shifted windows straight off the raw block —
            # no slab assembly, no halo rows (_shifted_windows_direct)
            v_r = sr_ref[p, 0]
            v_i = si_ref[p, 0]
            if "noshift" in ablate:
                a0 = min(h0, s_real - rows_out)      # stay in bounds
                wr = v_r[a0:a0 + rows_out]
                wi = v_i[a0:a0 + rows_out]
            else:
                wr = _shifted_windows_direct(v_r, t, q, qm, s_real, n,
                                             rows_out, h0, h1)
                wi = _shifted_windows_direct(v_i, t, q, qm, s_real, n,
                                             rows_out, h0, h1)
            ar_scr[p * s_pad:p * s_pad + rows_out, :] = wr
            ai_scr[p * s_pad:p * s_pad + rows_out, :] = wi
        else:
            # osr == 1 slab form (A/B alternative, _direct_windows):
            # assemble the halo'd slab in VMEM scratch
            sl_r[1:1 + s_real] = sr_ref[p, 0]
            sl_i[1:1 + s_real] = si_ref[p, 0]
            slab_r = sl_r[...]
            slab_i = sl_i[...]
            if "noshift" in ablate:
                wr = slab_r[1 + h0:1 + h0 + s_pad]
                wi = slab_i[1 + h0:1 + h0 + s_pad]
            else:
                wr = _shifted_windows(slab_r, slab_r, t, q, qm, srows, n,
                                      s_pad, s_real, h0)
                wi = _shifted_windows(slab_i, slab_i, t, q, qm, srows, n,
                                      s_pad, s_real, h0)
            ar_scr[p * s_pad:(p + 1) * s_pad, :] = wr
            ai_scr[p * s_pad:(p + 1) * s_pad, :] = wi
        # rotation phase (phy.cpp:218-225): rate * (s*n + t/osr + i),
        # separable as e^{j rate (sn + t/osr)} (x) e^{j rate i}
        rate = rate_ref[b]
        t_frac = t.astype(jnp.float32) * np.float32(1.0 / osr)
        rph_scr[p * s_pad:(p + 1) * s_pad] = (
            rate * (s_col * np.float32(n) + t_frac))       # (s_pad, 1)
        lph_scr[p:p + 1] = rate * i_lane                   # (1, n)

    rows = p_tile * s_pad
    if "norot" in ablate:
        _ablated_detect(mat_refs, ar_scr, ai_scr, idx_ref, pow_ref,
                        pav_ref, n, rows, mode, ablate)
        return
    # Pass 2 (batched): trig over all packets at once, static multiplier
    # folded into the lane factor, per-packet scale folded into the row
    # factor (everything is linear), then one full-width complex rotation.
    c_lane = jnp.cos(lph_scr[...])                   # (P, n)
    s_lane = jnp.sin(lph_scr[...])
    cm_all = c_lane * mr - s_lane * mi
    sm_all = s_lane * mr + c_lane * mi
    rph = rph_scr[...]                               # (rows, 1)
    c_row = jnp.cos(rph)
    s_row_ = jnp.sin(rph)
    for p in range(p_tile):
        b = g * p_tile + p
        s0 = p * s_pad
        scale = scale_ref[b]
        cmp_ = cm_all[p:p + 1]                       # (1, n)
        smp = sm_all[p:p + 1]
        crow = c_row[s0:s0 + s_pad] * scale          # (s_pad, 1)
        srow = s_row_[s0:s0 + s_pad] * scale
        cr = crow * cmp_ - srow * smp                # (s_pad, n)
        ci = crow * smp + srow * cmp_
        wr = ar_scr[s0:s0 + s_pad, :]
        wi = ai_scr[s0:s0 + s_pad, :]
        ar_scr[s0:s0 + s_pad, :] = wr * cr - wi * ci
        ai_scr[s0:s0 + s_pad, :] = wr * ci + wi * cr

    _ablated_detect(mat_refs, ar_scr, ai_scr, idx_ref, pow_ref, pav_ref,
                    n, rows, mode, ablate)


def _ablated_detect(mat_refs, ar_scr, ai_scr, idx_ref, pow_ref, pav_ref,
                    n, rows, mode, ablate=frozenset()):
    """Kernel tail: DFT + argmax + dB epilogue (or the _ABLATE stub).

    The per-row reductions come out as (rows, 1) columns; they are
    transposed to (1, rows) lane rows before the store because a
    last-dim-1 output block DMAs at ~3 us/step (lane-scatter) vs ~0.3
    with the row layout incl. the in-kernel relayout (~1.4 ms/iter at
    sf7's 512 grid steps — scripts/dma_floor.py class of probes, r5).
    """
    if "nodft" in ablate:
        ar = ar_scr[...]                             # (P*s_pad, n)
        ai = ai_scr[...]
        s = jnp.sum(ar * ar + ai * ai, axis=-1, keepdims=True)
        sr = jnp.transpose(s).reshape(1, rows)
        idx_ref[0] = sr
        pow_ref[0] = sr
        pav_ref[0] = sr
        return
    mats = [m[...] for m in mat_refs]
    idx, max_val, total = _dft_mag_argmax(ar_scr, ai_scr, mats, n, rows,
                                          mode)

    scale_db = np.float32(20.0 * np.log10(n))
    fund = jnp.sqrt(max_val)
    noise = jnp.sqrt(jnp.maximum(total - max_val, 0.0))
    idx_ref[0] = jnp.transpose(idx).reshape(1, rows)   # f32 bin index
    pow_ref[0] = jnp.transpose(20.0 * jnp.log10(fund)
                               - scale_db).reshape(1, rows)
    pav_ref[0] = jnp.transpose(20.0 * jnp.log10(noise)
                               - scale_db).reshape(1, rows)


@functools.partial(
    jax.jit,
    static_argnames=("n", "osr", "s_real", "halo", "interpret", "ablate"))
def _rx_call(stream_r, stream_i, t_off, rate, scale, mult_r, mult_i,
             *, n: int, osr: int, s_real: int, interpret: bool,
             halo: tuple = (0, 0), ablate: frozenset = frozenset()):
    b = stream_r.shape[0]
    h0, h1 = halo
    assert h0 >= 0 and h1 >= 0 and (halo == (0, 0) or osr == 1)
    nd = s_real - h0 - h1          # detected rows (halos feed slabs only)
    s_pad = _round_up(nd, 8)
    srows = _round_up(_round_up(s_real, 8) + 3, 8)
    total_len = s_real * n * osr
    assert stream_r.shape[-1] == total_len

    p_tile = _packets_per_tile(n)
    b_pad = _round_up(b, p_tile)
    if b_pad != b:
        zpad = ((0, b_pad - b), (0, 0))
        stream_r = jnp.pad(stream_r, zpad)
        stream_i = jnp.pad(stream_i, zpad)
        t_off = jnp.pad(t_off, (0, b_pad - b))
        rate = jnp.pad(rate, (0, b_pad - b))
        scale = jnp.pad(scale, (0, b_pad - b))

    padded = osr > 1
    if padded:
        # decimation-phase planes: oversampled index osr*d + p -> plane p,
        # decimated index d.  A pure reshape/transpose — bytes unchanged.
        dec_len = s_real * n
        pr = jnp.moveaxis(stream_r.reshape(b_pad, dec_len, osr), -1, 1)
        pi = jnp.moveaxis(stream_i.reshape(b_pad, dec_len, osr), -1, 1)
        # padded slab view per plane: 1 left pad row + data + right pad
        pad_r = (srows - 1) * n - dec_len
        pr = jnp.pad(pr, ((0, 0), (0, 0), (n, pad_r))).reshape(
            b_pad, osr, srows, n)
        pi = jnp.pad(pi, ((0, 0), (0, 0), (n, pad_r))).reshape(
            b_pad, osr, srows, n)
        slab_rows = srows
    else:
        # free bitcast of the raw stream; the halo'd slab is assembled in
        # VMEM scratch inside the kernel (the XLA pad + relayout copies
        # this replaces cost more HBM time than the kernel itself)
        pr = stream_r.reshape(b_pad, 1, s_real, n)
        pi = stream_i.reshape(b_pad, 1, s_real, n)
        slab_rows = s_real

    mode = _dft_mode(n)
    mats = _dft_const_arrays(n, mode)
    mat_specs = [pl.BlockSpec(m.shape, lambda i, nd=m.ndim: (0,) * nd,
                              memory_space=pltpu.VMEM) for m in mats]

    kernel = functools.partial(
        _rx_kernel, n=n, osr=osr, s_pad=s_pad, s_real=s_real,
        p_tile=p_tile, mode=mode, padded=padded, h0=h0, h1=h1,
        ablate=ablate)
    slab_spec = pl.BlockSpec((p_tile, osr, slab_rows, n),
                             lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM)
    smem_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    mult_spec = pl.BlockSpec((1, n), lambda i: (0, 0),
                             memory_space=pltpu.VMEM)
    grid = b_pad // p_tile
    rows = p_tile * s_pad
    # (1, rows) lane-row output blocks — see _ablated_detect
    out_dims = (grid, 1, rows)
    out_spec = pl.BlockSpec((1, 1, rows), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    idx, pw, pav = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[smem_spec, smem_spec, smem_spec, slab_spec, slab_spec,
                  mult_spec, mult_spec] + mat_specs,
        out_specs=[out_spec, out_spec, out_spec],
        out_shape=[
            jax.ShapeDtypeStruct(out_dims, jnp.float32),  # f32 bin idx
            jax.ShapeDtypeStruct(out_dims, jnp.float32),
            jax.ShapeDtypeStruct(out_dims, jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((rows, n), jnp.float32),
            pltpu.VMEM((rows, n), jnp.float32),
            pltpu.VMEM((p_tile, n), jnp.float32),     # lane rotation phases
            pltpu.VMEM((rows, 1), jnp.float32),       # row rotation phases
        ] + ([] if padded or _direct_windows(n) else [
            pltpu.VMEM((srows, n), jnp.float32),
            pltpu.VMEM((srows, n), jnp.float32),
        ]),
        interpret=interpret,
    )(t_off.astype(jnp.int32), rate.astype(jnp.float32),
      scale.astype(jnp.float32), pr, pi,
      mult_r.reshape(1, n), mult_i.reshape(1, n), *mats)
    idx = idx.reshape(b_pad, s_pad).astype(jnp.int32)
    pw = pw.reshape(b_pad, s_pad)
    pav = pav.reshape(b_pad, s_pad)
    return (idx[:b, :nd], pw[:b, :nd], pav[:b, :nd])


def rx_window_detect(stream_r, stream_i, t_off, rate, scale, mult_r, mult_i,
                     params, *, wide: bool = False, interpret: bool = False,
                     halo: tuple = (0, 0)):
    """Fused RX: timing-shifted windows + dechirp/window + DFT + detect.

    Args:
      stream_r/i: float32 (..., S * step) packet sample streams.
      t_off: int32 (...,) per-packet timing shift in oversampled samples,
        |t_off| <= step.
      rate: float32 (...,) CFO derotation rate per detection sample
        (-2*pi*cfo/n decimated; -2*pi*cfo/(n*osr) wide).
      scale: float32 (...,) per-packet amplitude normalization.
      mult_r/i: float32 (ndft,) per-sample multiplier (down-chirp and/or
        window; pass (ones, zeros) for the pre-dechirped tones path) where
        ndft = n decimated, n*osr wide.
      params: LoraParams.
      wide: detect over the full-rate (n*osr)-point grid (the injective
        BW-250/500 receiver, models/modem.py::demodulate_wide) instead of
        the reference's decimated n-point grid.
      halo: (lead, trail) stream symbol rows that only supply neighbor
        samples for the timing shift and are NOT detected — the chunked
        wide receiver's halos, which would otherwise pay full DFT +
        argmax work per chunk just to be sliced off (wide osr_k == 1
        only).

    Returns:
      (index, power_db, noise_db) each (..., S - lead - trail) matching
      ops/detect.py::detect_ri semantics (first-max argmax ties).
    """
    step = params.step
    if wide:
        ndft, osr_k = step, 1
    else:
        ndft, osr_k = params.n, params.osr
    assert mult_r.shape[-1] == ndft
    lead = stream_r.shape[:-1]
    s_real = stream_r.shape[-1] // step
    nd = s_real - halo[0] - halo[1]
    bsz = int(np.prod(lead)) if lead else 1
    sr = stream_r.reshape(bsz, s_real * step)
    si = stream_i.reshape(bsz, s_real * step)
    out = _rx_call(sr, si, t_off.reshape(bsz), rate.reshape(bsz),
                   scale.reshape(bsz), mult_r, mult_i,
                   n=ndft, osr=osr_k, s_real=s_real, interpret=interpret,
                   halo=tuple(halo), ablate=frozenset(_ABLATE))
    return tuple(o.reshape(lead + (nd,)) for o in out)
