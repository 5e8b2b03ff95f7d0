"""AWGN/channel + BER/PER sweep tests (the coverage TEST_PLAN.md promises
but the reference never shipped, SURVEY §4.4.4)."""
import numpy as np
import pytest

import jax

jax.config.update("jax_platforms", "cpu")

import lora_sdr_lightweight_standalone_library_clean_tpu as L
from lora_sdr_lightweight_standalone_library_clean_tpu.ops import channel
from lora_sdr_lightweight_standalone_library_clean_tpu.models.sweep import per_sweep


def test_awgn_snr_calibration():
    key = jax.random.PRNGKey(0)
    sig = np.ones((1, 1 << 14), np.float32)
    zr, zi = channel.awgn(key, sig, np.zeros_like(sig), snr_db=10.0)
    noise_power = np.mean((np.asarray(zr) - sig) ** 2 + np.asarray(zi) ** 2)
    assert abs(10 * np.log10(1.0 / noise_power) - 10.0) < 0.3


def test_cfo_injection_matches_script_semantics():
    """Per-symbol phase reset, like generate_lora_phy_vectors.py:113-117."""
    n_step = 64
    iq_r = np.ones((1, 2 * n_step), np.float32)
    iq_i = np.zeros_like(iq_r)
    rr, ri = channel.inject_cfo(iq_r, iq_i, 0.5, n_step)
    got = np.asarray(rr)[0] + 1j * np.asarray(ri)[0]
    n = np.arange(2 * n_step)
    want = np.exp(2j * np.pi * 0.5 * (n % n_step) / n_step)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_time_offset_injection():
    iq = np.arange(10, dtype=np.float32)[None]
    rr, _ = channel.inject_time_offset(iq, iq * 0, 3)
    np.testing.assert_array_equal(
        np.asarray(rr)[0], [3, 4, 5, 6, 7, 8, 9, 0, 0, 0])
    rr, _ = channel.inject_time_offset(iq, iq * 0, -2)
    np.testing.assert_array_equal(
        np.asarray(rr)[0], [0, 0, 0, 1, 2, 3, 4, 5, 6, 7])


def test_per_sweep_monotone():
    """PER must be ~1 at very low SNR and ~0 at high SNR for SF7."""
    p = L.LoraParams(sf=7)
    pts = per_sweep(p, [-30.0, 0.0], packets=64, payload_len=8, seed=1)
    low, high = pts[0], pts[1]
    assert low.per > 0.9
    assert high.per < 0.05
    assert high.ser < 0.05


def test_noise_only_decode_flags_crc_fail():
    """Pure-noise input decodes to garbage with crc_ok False — error
    lattice as data (SURVEY §5.3)."""
    p = L.LoraParams(sf=7)
    key = jax.random.PRNGKey(3)
    zeros = np.zeros((2, 10 * p.step), np.float32)
    nr, ni = channel.awgn(key, zeros, zeros, snr_db=-10.0)
    res = L.demodulate_tones(nr, ni, p)
    dec, crc_ok = L.decode(res.symbols)
    assert not np.asarray(crc_ok).any()
