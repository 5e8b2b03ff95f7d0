"""Fused Pallas TX kernel: one-hot tone matmul chirp synthesis, row-major out.

The XLA MXU modulate path (``ops/chirp.py::_modulate_ri_mxu``) computes the
right math but XLA lays its matmul output out batch-minor, and every
consumer downstream (the Pallas RX kernel, the flat IQ bitcast) needs
row-major — the relayout copies cost ~3.5 ms/iter at sf7 batch 8192, as
much as the RX kernel itself (PERF.md).  This kernel emits (B, S, n)
row-major directly: per packet the one-hot rows are built in VMEM from an
iota compare (no HBM one-hot), one (P*s_pad, n) x (n, n) matmul synthesizes
all tone factors on the MXU, and the base-chirp/sign/amplitude epilogue is
fused before the single output write.

``dechirp=True`` multiplies the per-sample constant by the demod down-chirp
(phy.cpp:206-208) — the modulate->dechirp producer chain of the reference
perf pipeline (tests/performance_test.cpp:112-125) collapses into the same
single write, exactly like XLA's own elementwise fusion, just without the
layout thrash.

Covers osr == 1 for all SFs: n <= 512 uses dense (n, n) tone tables; n >=
1024 the two-digit factorization w^(t*m') = w1[t mod n1, m1] * w2[t, m2]
(n2 = 128 lanes) assembled in VMEM (``_tx_kernel_factored``) — other
configurations use the XLA paths in ops/chirp.py.  Phase identity
(ops/chirp.py:193-207): at
osr == 1, ``chirp_s[m] = sign_row * base[m] * w^(t m)`` with
``t = (s * bw_scale) mod n`` and ``sign_row = (-1)^row`` for odd bw_scale.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .chirp import (_tx_base_chirp, _tx_tone_tables,
                    _tx_tone_tables_factored, downchirp_ri)
from .pallas_rx import _round_up, _packets_per_tile

__all__ = ["tx_supported", "tx_tone_synth"]

PALLAS_TX_MAX_N = 512            # dense (n, n) tone-table kernel
PALLAS_TX_MAX_N_FACTORED = 4096  # factored kernel (n1 x 128 digit tables)


def tx_supported(n: int, osr: int, platform: str | None = None,
                 bw_scale: int = 1) -> bool:
    """True when the fused TX kernel covers this configuration.

    osr == 1: all SFs (dense tables to 512, factored digit tables to 4096).
    osr > 1: the chunked tone kernel (``_tx_call_osr``) over tone modulus
    q = n*osr/bw_scale, gated to 128 <= q <= 4096 so the factored inner
    m1 loop stays <= 32 unrolled blocks (covers both wide profiles:
    sf9@250 osr2 -> q = 512 dense, sf12@500 osr4 -> q = 4096 factored).
    """
    if platform is None:
        platform = jax.default_backend()
    if platform != "tpu":
        return False
    if osr == 1:
        return n <= PALLAS_TX_MAX_N_FACTORED
    q, rem = divmod(n * osr, bw_scale)
    return rem == 0 and 128 <= q <= PALLAS_TX_MAX_N_FACTORED


def _tx_kernel(tone_ref, sgn_ref, wc_ref, ws_ref, re_ref, im_ref, *,
               n: int, s_pad: int, s_real: int, p_tile: int):
    """One grid step = ``p_tile`` packets.

    tone_ref: (1, P*s_pad) int32 tone indices t = (sym * bs) mod n as a
    flat packet-major lane row — a contiguous block the pipeline
    fetches cleanly.  (The earlier (P, s_pad, 1) layout's last-dim-1
    blocks lane-scattered into VMEM tiles at ~2.8 us per 4.6 KB step
    and gated the whole kernel below its store bandwidth —
    scripts/dma_floor.py probes, r5.)
    sgn_ref: (1, P*s_pad) f32 alternating-row signs (ones when the
    bw_scale parity needs none).
    wc/ws: (n, n) *premultiplied* tone tables — the (1, n) combined
    base-chirp * amplitude (* down-chirp) constant is folded into the
    table columns by the caller, and the row sign into the one-hot
    values, bit-exactly (the one-hot entries are exact 0/±1, so scaling
    before the matmul equals scaling after): the matmuls emit finished
    IQ with no epilogue.  The one-hot is built TRANSPOSED,
    ``ohT[k, L] = sgn[L] * (k == tone[L])`` with symbol rows on lanes,
    so the flat tone row is consumed without any sublane<->lane
    transpose; ``dot_general`` contracts the sublane dim of both
    operands (the MXU takes either operand orientation).
    re/im: (P, s_real, n) row-major outputs (or flat (P*s_real, n)).
    """
    rows_all = p_tile * s_pad
    trow = tone_ref[0]                               # (1, rows_all)
    sub = lax.broadcasted_iota(jnp.int32, (n, rows_all), 0)
    ohT = jnp.where(sub == trow, sgn_ref[...], 0.0)
    dn = (((0,), (0,)), ((), ()))                    # contract sublanes
    re = lax.dot_general(ohT, wc_ref[...], dn,
                         preferred_element_type=jnp.float32)
    im = lax.dot_general(ohT, ws_ref[...], dn,
                         preferred_element_type=jnp.float32)
    flat = re_ref.shape[0] == p_tile * s_real        # 2-D output block
    for p in range(p_tile):
        rows = re[p * s_pad:p * s_pad + s_real, :]
        rows_i = im[p * s_pad:p * s_pad + s_real, :]
        if flat:
            re_ref[p * s_real:(p + 1) * s_real, :] = rows
            im_ref[p * s_real:(p + 1) * s_real, :] = rows_i
        else:
            re_ref[p] = rows
            im_ref[p] = rows_i


@functools.partial(
    jax.jit, static_argnames=("n", "s_real", "alt_sign", "interpret"))
def _tx_call(tone, mult_r, mult_i, *, n: int, s_real: int, alt_sign: bool,
             interpret: bool):
    b = tone.shape[0]
    s_pad = _round_up(s_real, 8)
    p_tile = _packets_per_tile(n)
    b_pad = _round_up(b, p_tile)
    if b_pad != b:
        tone = jnp.pad(tone, ((0, b_pad - b), (0, 0)))
    if s_pad != s_real:
        tone = jnp.pad(tone, ((0, 0), (0, s_pad - s_real)))
    grid = b_pad // p_tile
    rows_all = p_tile * s_pad
    # flat packet-major tone rows: one contiguous (1, rows_all) lane-row
    # fetch per grid step (see _tx_kernel docstring)
    tone2 = tone.reshape(grid, 1, rows_all)
    sgn_row = np.ones((1, rows_all), np.float32)
    if alt_sign:
        sgn_row[0] = 1.0 - 2.0 * ((np.arange(rows_all) % s_pad) % 2)

    wc, ws = (jnp.asarray(a) for a in _tx_tone_tables(n))
    # fold the per-sample constant into the table columns (one tiny
    # (n, n) elementwise pass per call; see _tx_kernel docstring)
    mr = mult_r.reshape(1, n)
    mi = mult_i.reshape(1, n)
    wc2 = wc * mr - ws * mi
    ws2 = ws * mr + wc * mi
    kernel = functools.partial(_tx_kernel, n=n, s_pad=s_pad, s_real=s_real,
                               p_tile=p_tile)
    tone_spec = pl.BlockSpec((1, 1, rows_all), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)
    sgn_spec = pl.BlockSpec((1, rows_all), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    tab_spec = pl.BlockSpec((n, n), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    # 2-D output blocks whenever the sublane rule allows: Mosaic DMAs a
    # (P, s, n) 3-D output block at ~320 GB/s on the attached v5 chip
    # but a flat (P*s, n) 2-D block of the same bytes at ~650 GB/s
    # (store-only probes, r5) — the grid walks contiguous row ranges of
    # the same row-major buffer either way, so this is purely a spec
    # change.  Needs (p_tile * s_real) % 8 == 0 (Mosaic block rule).
    flat = (p_tile * s_real) % 8 == 0
    if flat:
        out_spec = pl.BlockSpec((p_tile * s_real, n), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((b_pad * s_real, n), jnp.float32)
    else:
        out_spec = pl.BlockSpec((p_tile, s_real, n), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((b_pad, s_real, n), jnp.float32)
    re, im = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[tone_spec, sgn_spec, tab_spec, tab_spec],
        out_specs=[out_spec, out_spec],
        out_shape=[out_shape, out_shape],
        interpret=interpret,
    )(tone2, jnp.asarray(sgn_row), wc2, ws2)
    re = re.reshape(b_pad, s_real, n)
    im = im.reshape(b_pad, s_real, n)
    return re[:b], im[:b]


def _tx_kernel_factored(tone_ref, w1c_ref, w1s_ref, w2c_ref, w2s_ref,
                        mr_ref, mi_ref, re_ref, im_ref, oh_scr, *,
                        n: int, n1: int, n2: int, s_pad: int, s_real: int,
                        p_tile: int, alt_sign: bool):
    """Factored tone synthesis for n >= 1024 (one grid step = p_tile packets).

    Output column q of symbol row s holds ``base[q] * w^(t*(q+1))`` with
    ``w^(t*m') = w1[t mod n1, m1] * w2[t, m2]`` for the digits
    ``m' = (q+1) mod n = m1*n2 + m2``.  Lane j of block m1 covers
    q = m1*n2 + j, i.e. m' = m1*n2 + (j+1): the column-rolled table
    ``w2s[t, j] = w2[t, (j+1) mod n2]`` supplies the m2 digit and the last
    lane (j = n2-1, where m' = (m1+1)*n2 + 0) takes its w1 factor from
    column (m1+1) mod n1 — the in-VMEM form of the jnp path's digit-order
    build + roll(-1) (ops/chirp.py::_modulate_ri_mxu), with no HBM roll
    pass and no relayout.

    tone_ref: (P, s_pad, 1) int32 tones; w1c/w1s: (npad1, n1) tables
    indexed by (t mod n1) one-hot over npad1 = 128 lanes; w2c/w2s:
    (n, n2) column-rolled tone tables; mr/mi: (n1, n2) combined
    base-chirp * amplitude (* down-chirp) constant laid out by output
    position q.  re/im: (P, s_real, n1, n2) row-major outputs (bitcast to
    (P, s_real*n) outside).
    """
    lane_n = lax.broadcasted_iota(jnp.int32, (s_pad, n), 1)
    lane_1 = lax.broadcasted_iota(jnp.int32, (s_pad, 128), 1)
    last = lax.broadcasted_iota(jnp.int32, (s_pad, n2), 1) == (n2 - 1)
    if alt_sign:
        srow = lax.broadcasted_iota(jnp.int32, (s_pad, 1), 0)
        sgn = jnp.where(lax.rem(srow, 2) == 1, -1.0, 1.0)
    for p in range(p_tile):
        t = tone_ref[p]                                  # (s_pad, 1)
        oh_scr[...] = (lane_n == t).astype(jnp.float32)
        f2c = jnp.dot(oh_scr[...], w2c_ref[...],
                      preferred_element_type=jnp.float32)   # (s_pad, n2)
        f2s = jnp.dot(oh_scr[...], w2s_ref[...],
                      preferred_element_type=jnp.float32)
        oh1 = (lane_1 == lax.rem(t, n1)).astype(jnp.float32)
        f1c = jnp.dot(oh1, w1c_ref[...],
                      preferred_element_type=jnp.float32)   # (s_pad, n1)
        f1s = jnp.dot(oh1, w1s_ref[...],
                      preferred_element_type=jnp.float32)
        for m1 in range(n1):
            m1n = (m1 + 1) % n1
            gc = jnp.where(last, f1c[:, m1n:m1n + 1], f1c[:, m1:m1 + 1])
            gs = jnp.where(last, f1s[:, m1n:m1n + 1], f1s[:, m1:m1 + 1])
            tc = gc * f2c - gs * f2s                     # (s_pad, n2)
            ts = gc * f2s + gs * f2c
            mr = mr_ref[m1][None, :]
            mi = mi_ref[m1][None, :]
            re = tc * mr - ts * mi
            im = ts * mr + tc * mi
            if alt_sign:
                re = re * sgn
                im = im * sgn
            re_ref[p, :, m1, :] = re[:s_real]
            im_ref[p, :, m1, :] = im[:s_real]


@functools.partial(
    jax.jit, static_argnames=("n", "s_real", "alt_sign", "interpret"))
def _tx_call_factored(tone, mult_r, mult_i, *, n: int, s_real: int,
                      alt_sign: bool, interpret: bool):
    n2 = 128
    n1 = n // n2
    b = tone.shape[0]
    s_pad = _round_up(s_real, 8)
    p_tile = max(1, 4096 // n)
    b_pad = _round_up(b, p_tile)
    if b_pad != b:
        tone = jnp.pad(tone, ((0, b_pad - b), (0, 0)))
    if s_pad != s_real:
        tone = jnp.pad(tone, ((0, 0), (0, s_pad - s_real)))
    tone3 = tone.reshape(b_pad, s_pad, 1)

    w1c, w1s, w2c, w2s = (np.asarray(a)
                          for a in _tx_tone_tables_factored(n, n2))
    # pad the (n1, n1) w1 tables to 128 one-hot rows; roll w2 columns so
    # lane j carries the m2 = (j+1) mod n2 digit (see kernel docstring)
    w1c_p = np.zeros((128, n1), np.float32)
    w1s_p = np.zeros((128, n1), np.float32)
    w1c_p[:n1] = w1c
    w1s_p[:n1] = w1s
    w2c_r = np.roll(w2c, -1, axis=1)
    w2s_r = np.roll(w2s, -1, axis=1)

    grid = b_pad // p_tile
    kernel = functools.partial(_tx_kernel_factored, n=n, n1=n1, n2=n2,
                               s_pad=s_pad, s_real=s_real, p_tile=p_tile,
                               alt_sign=alt_sign)
    tone_spec = pl.BlockSpec((p_tile, s_pad, 1), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)
    w1_spec = pl.BlockSpec((128, n1), lambda i: (0, 0),
                           memory_space=pltpu.VMEM)
    w2_spec = pl.BlockSpec((n, n2), lambda i: (0, 0),
                           memory_space=pltpu.VMEM)
    mult_spec = pl.BlockSpec((n1, n2), lambda i: (0, 0),
                             memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((p_tile, s_real, n1, n2),
                            lambda i: (i, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    re, im = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[tone_spec, w1_spec, w1_spec, w2_spec, w2_spec,
                  mult_spec, mult_spec],
        out_specs=[out_spec, out_spec],
        out_shape=[
            jax.ShapeDtypeStruct((b_pad, s_real, n1, n2), jnp.float32),
            jax.ShapeDtypeStruct((b_pad, s_real, n1, n2), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((s_pad, n), jnp.float32)],
        interpret=interpret,
    )(tone3, jnp.asarray(w1c_p), jnp.asarray(w1s_p),
      jnp.asarray(w2c_r), jnp.asarray(w2s_r),
      mult_r.reshape(n1, n2), mult_i.reshape(n1, n2))
    return (re[:b].reshape(b, s_real, n),
            im[:b].reshape(b, s_real, n))


def _tx_osr_kernel(tone_ref, thr1_ref, thr2_ref, *rest, q: int,
                   r_tile: int, gated: bool, factored: bool):
    """One grid step = one packet's ``r_tile`` chunk rows (osr > 1).

    Each output chunk row r = s*bw_scale + k holds samples
    m = k*q+1 .. (k+1)*q of symbol s.  The exact integer phase factors as
    (tests validate vs ops/chirp.py's closed form, derivation in
    ``tx_tone_synth`` docstring)::

        chirp[m] = mult_row[m''] * w^(t * m'') * wt[m'']^(g1 + g2)

    with w = exp(2j*pi/q), tone t = sym mod q, m'' the within-chunk
    sample, ``mult_row`` the static base-chirp/carry/amplitude(/down-chirp)
    constant for row class (s mod carry period, k), wrap tone
    wt[m] = exp(-2j*pi*bw_scale*m/osr) (chunk-independent because
    bs*q/osr = n), and per-row gates g1: m > b - sym*osr,
    g2: m > 2b - sym*osr (each frequency wrap of genChirp's accumulator,
    ChirpGenerator.hpp:36,44, multiplies in one factor of wt; u^c terms
    vanish because bs*sym and bs*n are integers).  ``gated`` is statically
    False when osr | bs (wt == 1 identically, e.g. both wide profiles).

    tone/thr1/thr2: (1, r_tile, 1) int32 per-row tone index and gate
    thresholds in within-chunk lane units.
    """
    if factored:
        (w1c_ref, w1s_ref, w2c_ref, w2s_ref, e_ref, wtc_ref, wts_ref,
         mr_ref, mi_ref, re_ref, im_ref, oh_scr) = rest
        n1 = w1c_ref.shape[1]
        n2 = 128
    else:
        (wc_ref, ws_ref, wtc_ref, wts_ref, mr_ref, mi_ref,
         re_ref, im_ref, oh_scr) = rest
    lane = lax.broadcasted_iota(jnp.int32, (r_tile, q), 1)
    t = tone_ref[0]                                  # (r_tile, 1)
    thr1 = thr1_ref[0]
    thr2 = thr2_ref[0]

    if not factored:
        oh_scr[...] = (lane == t).astype(jnp.float32)
        c = jnp.dot(oh_scr[...], wc_ref[...],
                    preferred_element_type=jnp.float32)     # (r_tile, q)
        s_ = jnp.dot(oh_scr[...], ws_ref[...],
                     preferred_element_type=jnp.float32)
        if gated:
            wtc = wtc_ref[0][None, :]
            wts = wts_ref[0][None, :]
            for thr in (thr1, thr2):
                g = lane >= thr
                c, s_ = (jnp.where(g, c * wtc - s_ * wts, c),
                         jnp.where(g, c * wts + s_ * wtc, s_))
        mr = mr_ref[...]                             # (r_tile, q)
        mi = mi_ref[...]
        re_ref[0] = c * mr - s_ * mi
        im_ref[0] = c * mi + s_ * mr
        return

    # factored tone synthesis over modulus q (512 < q <= 4096): digit
    # assembly as in _tx_kernel_factored (w2 columns pre-rolled, last
    # lane takes w1 from column m1+1), but FULL WIDTH: the per-block w1
    # factor expands to (r_tile, q) through one one-hot expansion matmul
    # (e_ref bakes the last-lane m1+1 carry), and the q/128-iteration
    # per-block loop of single-lane-tile VPU ops — measured
    # instruction-bound at q = 4096 — becomes ~8 full-width ops.
    # Arithmetic is value-identical to the loop form.
    lane_1 = lax.broadcasted_iota(jnp.int32, (r_tile, 128), 1)
    oh_scr[...] = (lane == t).astype(jnp.float32)
    f2c = jnp.dot(oh_scr[...], w2c_ref[...],
                  preferred_element_type=jnp.float32)       # (r_tile, n2)
    f2s = jnp.dot(oh_scr[...], w2s_ref[...],
                  preferred_element_type=jnp.float32)
    oh1 = (lane_1 == lax.rem(t, n1)).astype(jnp.float32)
    f1c = jnp.dot(oh1, w1c_ref[...],
                  preferred_element_type=jnp.float32)       # (r_tile, n1)
    f1s = jnp.dot(oh1, w1s_ref[...],
                  preferred_element_type=jnp.float32)
    gc = jnp.dot(f1c, e_ref[...],
                 preferred_element_type=jnp.float32)        # (r_tile, q)
    gs = jnp.dot(f1s, e_ref[...],
                 preferred_element_type=jnp.float32)
    f2c_w = jnp.broadcast_to(f2c[:, None, :],
                             (r_tile, n1, n2)).reshape(r_tile, q)
    f2s_w = jnp.broadcast_to(f2s[:, None, :],
                             (r_tile, n1, n2)).reshape(r_tile, q)
    tc = gc * f2c_w - gs * f2s_w                     # (r_tile, q)
    ts = gc * f2s_w + gs * f2c_w
    if gated:
        wtc = wtc_ref[0][None, :]
        wts = wts_ref[0][None, :]
        for thr in (thr1, thr2):
            g = lane >= thr
            tc, ts = (jnp.where(g, tc * wtc - ts * wts, tc),
                      jnp.where(g, tc * wts + ts * wtc, ts))
    mr = mr_ref[...]                                 # (r_tile, q)
    mi = mi_ref[...]
    re_ref[0] = tc * mr - ts * mi
    im_ref[0] = tc * mi + ts * mr


@functools.lru_cache(maxsize=None)
def _tx_osr_mult(sf: int, bw_scale: int, osr: int, s_total: int,
                 amplitude: float, dechirp: bool):
    """(R, q) float32 multiplier rows: carry(s) * amp * base-chirp chunk
    (* down-chirp chunk), R = s_total * bw_scale, computed exactly from
    integer residues in float64.  Also returns (wtc, wts) (1, q) wrap
    tone and whether gating is statically needed."""
    n = 1 << sf
    bs = bw_scale
    nn = n * osr
    d = n * osr * osr
    b = n * osr
    q = nn // bs
    m = np.arange(1, nn + 1, dtype=np.int64)
    bnum = np.mod(bs * (m * (m + 1) - m * b), 2 * d)
    base = amplitude * np.exp(1j * np.pi * bnum.astype(np.float64) / d)
    if dechirp:
        dcr, dci = downchirp_ri(sf, bs, osr)
        base = base * (dcr.astype(np.float64) + 1j * dci.astype(np.float64))
    # per-symbol carry: start-of-symbol numerator s*b*bs mod 2d
    s_idx = np.arange(s_total, dtype=np.int64)
    carry = np.exp(1j * np.pi
                   * np.mod(s_idx * b * bs, 2 * d).astype(np.float64) / d)
    mult = carry[:, None, None] * base.reshape(bs, q)[None]   # (S, bs, q)
    mult = mult.reshape(s_total * bs, q)
    gated = bs % osr != 0
    wt = np.exp(-2j * np.pi * bs * m[:q].astype(np.float64) / osr)
    return (np.ascontiguousarray(mult.real).astype(np.float32),
            np.ascontiguousarray(mult.imag).astype(np.float32),
            wt.real.astype(np.float32).reshape(1, q),
            wt.imag.astype(np.float32).reshape(1, q),
            gated)


@functools.partial(
    jax.jit, static_argnames=("sf", "osr", "bs", "s_total", "amplitude",
                              "dechirp", "interpret"))
def _tx_call_osr(symbols, *, sf: int, osr: int, bs: int, s_total: int,
                 amplitude: float, dechirp: bool, interpret: bool):
    """osr > 1 tone-synthesis kernel: (B, S) symbols -> (B, S*n*osr) IQ."""
    n = 1 << sf
    b_samp = n * osr
    q = b_samp // bs
    bcount = symbols.shape[0]
    r_real = s_total * bs

    # per-row tone index + gate thresholds (within-chunk lane units)
    sym = symbols.astype(jnp.int32)                       # (B, S)
    kq = (jnp.arange(bs, dtype=jnp.int32) * q)[None, None, :]
    t_rows = jnp.broadcast_to(jnp.mod(sym, q)[..., None],
                              sym.shape + (bs,))
    thr1 = (b_samp - sym * osr)[..., None] - kq
    thr2 = thr1 + b_samp
    t_rows = t_rows.reshape(bcount, r_real)
    thr1 = thr1.reshape(bcount, r_real)
    thr2 = thr2.reshape(bcount, r_real)

    rows_target = 128 if q <= 1024 else 64
    n_r = -(-r_real // rows_target)
    r_tile = _round_up(-(-r_real // n_r), 8)
    r_pad = r_tile * n_r
    if r_pad != r_real:
        pad = ((0, 0), (0, r_pad - r_real))
        t_rows = jnp.pad(t_rows, pad)
        # padded rows: thresholds of 2*q gate nothing; mult rows are 0
        thr1 = jnp.pad(thr1, pad, constant_values=2 * q)
        thr2 = jnp.pad(thr2, pad, constant_values=2 * q)
    t3 = t_rows.reshape(bcount, r_pad, 1)
    thr1 = thr1.reshape(bcount, r_pad, 1)
    thr2 = thr2.reshape(bcount, r_pad, 1)

    mr_np, mi_np, wtc_np, wts_np, gated = _tx_osr_mult(
        sf, bs, osr, s_total, float(amplitude), dechirp)
    if r_pad != r_real:
        zpad = ((0, r_pad - r_real), (0, 0))
        mr_np = np.pad(mr_np, zpad)
        mi_np = np.pad(mi_np, zpad)

    factored = q > PALLAS_TX_MAX_N
    row_spec = pl.BlockSpec((1, r_tile, 1), lambda i, j: (i, j, 0),
                            memory_space=pltpu.VMEM)
    wt_spec = pl.BlockSpec((1, q), lambda i, j: (0, 0),
                           memory_space=pltpu.VMEM)
    mult_spec = pl.BlockSpec((r_tile, q), lambda i, j: (j, 0),
                             memory_space=pltpu.VMEM)
    if factored:
        n2 = 128
        n1 = q // n2
        w1c, w1s, w2c, w2s = (np.asarray(a)
                              for a in _tx_tone_tables_factored(q, n2))
        w1c_p = np.zeros((128, n1), np.float32)
        w1s_p = np.zeros((128, n1), np.float32)
        w1c_p[:n1] = w1c
        w1s_p[:n1] = w1s
        # one-hot expansion matrix: lane m1*n2 + j takes w1 column m1
        # (j < n2-1) or m1+1 mod n1 (the last lane's carry)
        e = np.zeros((n1, q), np.float32)
        for m1 in range(n1):
            e[m1, m1 * n2:m1 * n2 + n2 - 1] = 1.0
            e[(m1 + 1) % n1, m1 * n2 + n2 - 1] = 1.0
        tabs = [jnp.asarray(w1c_p), jnp.asarray(w1s_p),
                jnp.asarray(np.roll(w2c, -1, axis=1)),
                jnp.asarray(np.roll(w2s, -1, axis=1)),
                jnp.asarray(e)]
        tab_specs = [pl.BlockSpec((128, n1), lambda i, j: (0, 0),
                                  memory_space=pltpu.VMEM)] * 2 + \
                    [pl.BlockSpec((q, n2), lambda i, j: (0, 0),
                                  memory_space=pltpu.VMEM)] * 2 + \
                    [pl.BlockSpec((n1, q), lambda i, j: (0, 0),
                                  memory_space=pltpu.VMEM)]
        out_spec = pl.BlockSpec((1, r_tile, q), lambda i, j: (i, j, 0),
                                memory_space=pltpu.VMEM)
        out_shape = [jax.ShapeDtypeStruct((bcount, r_pad, q),
                                          jnp.float32)] * 2
    else:
        wc, ws = (jnp.asarray(a) for a in _tx_tone_tables(q))
        tabs = [wc, ws]
        tab_specs = [pl.BlockSpec((q, q), lambda i, j: (0, 0),
                                  memory_space=pltpu.VMEM)] * 2
        out_spec = pl.BlockSpec((1, r_tile, q), lambda i, j: (i, j, 0),
                                memory_space=pltpu.VMEM)
        out_shape = [jax.ShapeDtypeStruct((bcount, r_pad, q),
                                          jnp.float32)] * 2

    kernel = functools.partial(_tx_osr_kernel, q=q, r_tile=r_tile,
                               gated=gated, factored=factored)
    re, im = pl.pallas_call(
        kernel,
        grid=(bcount, n_r),
        in_specs=[row_spec, row_spec, row_spec] + tab_specs
                 + [wt_spec, wt_spec, mult_spec, mult_spec],
        out_specs=[out_spec, out_spec],
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((r_tile, q), jnp.float32)],
        interpret=interpret,
    )(t3, thr1, thr2, *tabs, jnp.asarray(wtc_np), jnp.asarray(wts_np),
      jnp.asarray(mr_np), jnp.asarray(mi_np))
    re = re.reshape(bcount, r_pad, q)[:, :r_real]
    im = im.reshape(bcount, r_pad, q)[:, :r_real]
    return (re.reshape(bcount, s_total * b_samp),
            im.reshape(bcount, s_total * b_samp))


def tx_tone_synth(symbols_with_sync, params, amplitude: float = 1.0,
                  dechirp: bool = False, *, interpret: bool = False):
    """Synthesize a packet's chirps (sync prelude included by the caller).

    Args:
      symbols_with_sync: int32 (..., S+2) symbol values (sync chirps first,
        ops/chirp.py::_with_sync_prelude).
      dechirp: additionally multiply by the demod down-chirp so the output
        IS the pre-dechirped stream (tests/e2e_chain_test.cpp:79-93's
        external dechirp, fused into the synthesis write).

    Returns (re, im) float32 of shape (..., (S+2) * n * osr), row-major.

    osr > 1 derivation (validated exactly vs ops/chirp.py's integer
    numerators): with b = n*osr, d = n*osr^2, the accumulated phase
    pi*bs*num(m)/d of ``chirp_phase_numerators`` splits per sample m into
    a static base pi*bs*(m(m+1) - m*b)/d, a tone 2*pi*sym*m/q over modulus
    q = b/bs, a wrap factor u^W(m) with u = exp(-2j*pi*bs/osr) and
    W(m) = max(0, sym*osr + m - b) + max(0, sym*osr + m - 2b) (valid for
    sym < 2n like the closed form), and a sym-independent per-symbol carry
    exp(j*pi*bs*s/osr).  Because u^(sym*osr) = u^(-b) = 1, each active
    wrap threshold contributes the same static tone u^m — two gated
    multiplies, statically elided when osr | bs (both wide profiles).
    """
    n, bs = params.n, params.bw_scale
    assert tx_supported(n, params.osr, platform="tpu", bw_scale=bs)
    amplitude = np.float32(np.clip(amplitude, -1.0, 1.0))  # LoRaMod.cpp:18
    sym = jnp.asarray(symbols_with_sync, jnp.int32)
    lead = sym.shape[:-1]
    s_total = sym.shape[-1]
    if params.osr > 1:
        re, im = _tx_call_osr(
            sym.reshape(-1, s_total), sf=params.sf, osr=params.osr, bs=bs,
            s_total=s_total, amplitude=float(amplitude), dechirp=dechirp,
            interpret=interpret)
        out = lead + (s_total * n * params.osr,)
        return re.reshape(out), im.reshape(out)
    tone = jnp.mod(sym * bs, n).reshape(-1, s_total)

    bc, bsn = _tx_base_chirp(n, bs)
    mr = (amplitude * bc).astype(np.float32)
    mi = (amplitude * bsn).astype(np.float32)
    if dechirp:
        dcr, dci = downchirp_ri(params.sf, bs)
        mr, mi = mr * dcr - mi * dci, mr * dci + mi * dcr
    alt_sign = bool((bs * n) % (2 * n))
    call = _tx_call if n <= PALLAS_TX_MAX_N else _tx_call_factored
    re, im = call(tone, jnp.asarray(mr), jnp.asarray(mi),
                  n=n, s_real=s_total, alt_sign=alt_sign,
                  interpret=interpret)
    out = lead + (s_total * n,)
    return re.reshape(out), im.reshape(out)
