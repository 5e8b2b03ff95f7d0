"""Pre-dechirped ("tones") demodulation path — golden-vector parity.

Re-design of the reference's legacy vector path ``lora_demodulate``
(``src/phy/LoRaDemod.cpp:50-197``): callers dechirp externally and this
function performs peak normalization, the 2-symbol CFO/timing estimate with
the *explicit lowest-index tie-break* (LoRaDemod.cpp:102-111), per-symbol CFO
derotation, windowing, detection, and sync-word nibble extraction.  This is
the exact path the reference perf harness times (tests/performance_test.cpp:
112-125) and the path the golden IQ vectors validate.

Batched over leading axes; pure function of (iq planes, params).
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

from ..ops.detect import detect_ri
from ..utils.config import LoraParams
from .modem import (_estimate_core, _timing_shifted_windows, window_table,
                    TWO_PI, DemodResult)

__all__ = ["demodulate_tones"]


def _use_rx_kernel(params: LoraParams, backend: str,
                   s_real: int = 8) -> bool:
    """Pick the fully-fused RX kernel (ops/pallas_rx.py): timing shift +
    dechirp/window + DFT + detect in one pass.  'auto' uses it whenever the
    platform/config supports it; 'pallas_rx' forces it."""
    if backend == "pallas_rx":
        return True
    if backend != "auto":
        return False
    from ..ops.pallas_rx import rx_supported
    return rx_supported(params.n, params.osr, s_real=s_real)


def demodulate_tones(iq_r, iq_i, params: LoraParams,
                     normalize: bool = True,
                     backend: str = "auto") -> DemodResult:
    """Demodulate pre-dechirped samples (LoRaDemod.cpp:50-197).

    Matches the reference exactly, including:
     - peak normalization into [-1, 1] only when max(|I|,|Q|) > 1
       (LoRaDemod.cpp:60-78); with device arrays the scratch buffer of the C
       API is unnecessary, so the -ERANGE path does not exist here.
     - equal-power lowest-index tie-break during estimation
       (LoRaDemod.cpp:102-111).
     - sync-word extraction only when >= 2 symbols are present
       (LoRaDemod.cpp:166-193); with fewer symbols all detections are data.
    """
    n, osr, step = params.n, params.osr, params.step
    sample_count = iq_r.shape[-1]
    total = sample_count // step
    have_sync = total >= 2
    cut = total * step
    iq_r = iq_r[..., :cut]
    iq_i = iq_i[..., :cut]

    if normalize:
        # one reduction pass for the peak; the scale multiplies the (much
        # smaller) estimator slice and symbol windows instead of
        # materializing a normalized copy of the whole stream
        max_amp = jnp.maximum(
            jnp.max(jnp.abs(iq_r), axis=-1), jnp.max(jnp.abs(iq_i), axis=-1))
        scale = jnp.where(max_amp > 1.0, 1.0 / max_amp, 1.0)[..., None]
    else:
        scale = jnp.ones(iq_r.shape[:-1] + (1,), jnp.float32)

    est_syms = min(total, 2)
    est = _estimate_core(iq_r[..., : est_syms * step] * scale,
                         iq_i[..., : est_syms * step] * scale,
                         params, est_syms, tie_break_idx=True)
    t_off = jnp.round(est.time_offset).astype(jnp.int32)
    rate = -TWO_PI * est.cfo / np.float32(n)

    if _use_rx_kernel(params, backend, total):
        # single fused kernel: timing shift + normalize + window + rotate +
        # DFT + detect, windows never touch HBM (ops/pallas_rx.py)
        from ..ops.pallas_rx import rx_window_detect
        win = window_table(n, params.window)
        mr = np.ones(n, np.float32) if win is None else win
        idx, power, power_avg = rx_window_detect(
            iq_r, iq_i, jnp.clip(t_off, -step, step), rate, scale[..., 0],
            jnp.asarray(mr), jnp.zeros(n, jnp.float32), params)
    else:
        zr, zi = _timing_shifted_windows(iq_r, iq_i, t_off, total, step,
                                         osr, n)
        zr = zr * scale[..., None]
        zi = zi * scale[..., None]

        s_idx = jnp.arange(total, dtype=jnp.float32) * np.float32(n)
        start = rate[..., None] * (
            s_idx + t_off.astype(jnp.float32)[..., None] / np.float32(osr))

        idx, power, power_avg = _rotate_detect(zr, zi, rate, start, params,
                                               backend)
    if have_sync:
        sw0, sw1 = idx[..., 0], idx[..., 1]
        shift = params.sf - 4 if params.sf > 4 else 0
        sync = ((((sw0 >> shift) & 0xF) << 4) | ((sw1 >> shift) & 0xF))
        symbols = idx[..., 2:]
    else:
        sync = jnp.zeros(idx.shape[:-1], jnp.int32)
        symbols = idx
    return DemodResult(
        symbols=symbols.astype(jnp.uint16),
        sync_word=sync.astype(jnp.uint8),
        cfo=est.cfo,
        time_offset=est.time_offset,
        power=power,
        power_avg=power_avg,
    )


def _rotate_detect(zr, zi, rate, start, params: LoraParams, backend: str):
    """CFO-rotate + window + detect, via the fused Pallas kernel when on
    TPU and N <= 512, else the jnp path.  The window is applied before the
    kernel's rotation (the reference rotates first, phy.cpp:218-227 — a
    float reordering that cannot change any detection: both orders scale
    each sample by the same two factors)."""
    n = params.n
    from ..ops.pallas_detect import fused_rotate_detect, pallas_supported
    use_pallas = backend == "pallas" or (
        backend == "auto" and pallas_supported(n))
    win = window_table(n, params.window)
    if use_pallas:
        wr, wi = zr, zi
        if win is not None:
            w = jnp.asarray(win)
            wr = wr * w
            wi = wi * w
        batched = wr.ndim == 3
        if not batched:
            wr, wi = wr[None], wi[None]
            rate = rate[None]
            start = start[None]
        idx, power, power_avg = fused_rotate_detect(wr, wi, rate, start)
        if not batched:
            idx, power, power_avg = idx[0], power[0], power_avg[0]
        return idx, power, power_avg
    ph = start[..., None] + rate[..., None, None] * jnp.arange(
        n, dtype=jnp.float32)
    c, s = jnp.cos(ph), jnp.sin(ph)
    fr = zr * c - zi * s
    fi = zr * s + zi * c
    if win is not None:
        w = jnp.asarray(win)
        fr = fr * w
        fi = fi * w
    det = detect_ri(fr, fi)
    return det.index, det.power, det.power_avg
