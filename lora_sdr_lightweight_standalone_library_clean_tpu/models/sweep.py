"""BER/PER-vs-SNR sweep harness — the tooling TEST_PLAN.md promises.

The reference's TEST_PLAN references an ``awgn_sweep.py`` that does not
exist and AWGN golden blobs that were stripped (SURVEY §4.4).  Here the
sweep is a first-class jitted pipeline: thousands of packets per SNR point
run as one batched device computation (modulate -> AWGN(+CFO) -> dechirp ->
demod -> decode -> error rates), with metrics returned as arrays.
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import channel
from ..utils.config import LoraParams
from .modem import encode, decode, modulate, dechirp
from .tones import demodulate_tones

__all__ = ["SweepPoint", "per_sweep"]


class SweepPoint(NamedTuple):
    snr_db: float
    ser: float        # symbol error rate
    ber: float        # payload bit error rate
    per: float        # packet error rate (any payload byte wrong)
    crc_ok_rate: float


def _sweep_step(params: LoraParams, payload_len: int):
    @jax.jit
    def step(key, payloads, snr_db):
        syms = encode(payloads)
        re, im = modulate(syms, params)
        dr, di = dechirp(re, im, params)
        dr, di = channel.awgn(key, dr, di, snr_db)
        res = demodulate_tones(dr, di, params)
        dec, crc_ok = decode(res.symbols, check_crc=True)
        # detected bins live in [0, N): compare against (sym*bs) mod N,
        # the modulation's symbol->bin mapping (PARITY.md defect 2)
        expect_bins = ((syms.astype(jnp.int32) * params.bw_scale)
                       % params.n).astype(res.symbols.dtype)
        sym_err = jnp.mean((res.symbols != expect_bins).astype(jnp.float32))
        bit_err = jnp.mean(_popcount8(jnp.bitwise_xor(
            dec.astype(jnp.int32), payloads.astype(jnp.int32)))) / 8.0
        pkt_err = jnp.mean(
            jnp.any(dec != payloads, axis=-1).astype(jnp.float32))
        return sym_err, bit_err, pkt_err, jnp.mean(crc_ok.astype(jnp.float32))

    return step


def _popcount8(x):
    x = x - ((x >> 1) & 0x55)
    x = (x & 0x33) + ((x >> 2) & 0x33)
    return (x + (x >> 4)) & 0x0F


def per_sweep(params: LoraParams, snrs_db, packets: int = 1000,
              payload_len: int = 16, seed: int = 0) -> list[SweepPoint]:
    """Run a PER/BER sweep over ``snrs_db`` with ``packets`` random packets
    per point.  All packets in a point run as one batched device call."""
    rng = np.random.default_rng(seed)
    payloads = jnp.asarray(
        rng.integers(0, 256, (packets, payload_len)).astype(np.uint8))
    step = _sweep_step(params, payload_len)
    out = []
    key = jax.random.PRNGKey(seed)
    for snr in snrs_db:
        key, sub = jax.random.split(key)
        ser, ber, per, crc = step(sub, payloads, jnp.float32(snr))
        out.append(SweepPoint(float(snr), float(ser), float(ber),
                              float(per), float(crc)))
    return out
