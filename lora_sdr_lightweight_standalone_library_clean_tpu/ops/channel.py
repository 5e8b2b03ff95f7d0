"""Channel models: AWGN, CFO and timing-offset injection — jitted, batched.

The reference's only channel tooling is post-hoc CSV rewriting in
``scripts/generate_lora_phy_vectors.py:106-128`` (rotation + integer shift)
and missing AWGN golden blobs.  Here the channel is a first-class jitted op
so BER/PER sweeps run on-device over batches of packets (SURVEY §5.3).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["awgn", "inject_cfo", "inject_time_offset", "apply_channel"]

TWO_PI = np.float32(2.0 * np.pi)


def awgn(key, iq_r, iq_i, snr_db):
    """Add complex white Gaussian noise for a given SNR (dB) relative to
    unit signal power.  ``snr_db`` may be scalar or batched over leading
    axes of ``iq``."""
    snr_db = jnp.asarray(snr_db, jnp.float32)
    sigma = jnp.sqrt(0.5) * 10.0 ** (-snr_db / 20.0)
    while sigma.ndim < iq_r.ndim:
        sigma = sigma[..., None]
    kr, ki = jax.random.split(key)
    nr = jax.random.normal(kr, iq_r.shape, jnp.float32) * sigma
    ni = jax.random.normal(ki, iq_i.shape, jnp.float32) * sigma
    return iq_r + nr, iq_i + ni


def inject_cfo(iq_r, iq_i, cfo_bins, n_step: int, per_symbol_phase: bool = True):
    """Rotate by a CFO given in FFT bins (generate_lora_phy_vectors.py:113-117).

    The reference script applies ``exp(2j*pi*cfo*(n % N)/N)`` — the phase
    ramp resets each symbol (``per_symbol_phase=True``).  Set False for a
    continuous ramp (physically realistic CFO).
    """
    count = iq_r.shape[-1]
    n = jnp.arange(count, dtype=jnp.float32)
    if per_symbol_phase:
        n = jnp.mod(n, np.float32(n_step))
    cfo_bins = jnp.asarray(cfo_bins, jnp.float32)
    while cfo_bins.ndim < iq_r.ndim:
        cfo_bins = cfo_bins[..., None]
    ph = TWO_PI * cfo_bins * n / np.float32(n_step)
    c, s = jnp.cos(ph), jnp.sin(ph)
    return iq_r * c - iq_i * s, iq_r * s + iq_i * c


def inject_time_offset(iq_r, iq_i, shift: int):
    """Integer sample shift with zero fill
    (generate_lora_phy_vectors.py:118-125): positive drops leading samples,
    negative prepends zeros."""
    count = iq_r.shape[-1]
    idx = jnp.arange(count, dtype=jnp.int32) + shift
    valid = (idx >= 0) & (idx < count)
    idxc = jnp.clip(idx, 0, count - 1)
    rr = jnp.where(valid, iq_r[..., idxc], 0.0)
    ri = jnp.where(valid, iq_i[..., idxc], 0.0)
    return rr, ri


def apply_channel(key, iq_r, iq_i, snr_db=None, cfo_bins=None,
                  time_offset=None, n_step: int | None = None):
    """Compose impairments: CFO rotation, timing shift, then AWGN."""
    if cfo_bins is not None:
        iq_r, iq_i = inject_cfo(iq_r, iq_i, cfo_bins, n_step)
    if time_offset:
        iq_r, iq_i = inject_time_offset(iq_r, iq_i, int(time_offset))
    if snr_db is not None:
        iq_r, iq_i = awgn(key, iq_r, iq_i, snr_db)
    return iq_r, iq_i
