"""Fused Pallas detect kernel: equivalence with the jnp path (interpret
mode on CPU; the real kernel is exercised on TPU by bench.py and
scripts/tpu_validate.py)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")

import lora_sdr_lightweight_standalone_library_clean_tpu as L
from lora_sdr_lightweight_standalone_library_clean_tpu.ops.detect import detect_ri
from lora_sdr_lightweight_standalone_library_clean_tpu.ops.pallas_detect import (
    fused_rotate_detect)


@pytest.mark.parametrize("sf", [7, 8, 9])
def test_fused_kernel_matches_jnp(sf):
    p = L.LoraParams(sf=sf)
    rng = np.random.default_rng(sf)
    b, s, n = 3, 6, p.n
    zr = rng.standard_normal((b, s, n)).astype(np.float32)
    zi = rng.standard_normal((b, s, n)).astype(np.float32)
    rate = rng.standard_normal(b).astype(np.float32) * 0.01
    start = rng.standard_normal((b, s)).astype(np.float32)

    idx, power, pav = fused_rotate_detect(
        jnp.asarray(zr), jnp.asarray(zi), jnp.asarray(rate),
        jnp.asarray(start), interpret=True)

    ph = start[..., None] + rate[:, None, None] * np.arange(n, dtype=np.float32)
    c, si = np.cos(ph), np.sin(ph)
    fr = zr * c - zi * si
    fi = zr * si + zi * c
    det = detect_ri(jnp.asarray(fr), jnp.asarray(fi))

    np.testing.assert_array_equal(np.asarray(idx), np.asarray(det.index))
    np.testing.assert_allclose(np.asarray(power), np.asarray(det.power),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(pav), np.asarray(det.power_avg),
                               rtol=1e-4, atol=1e-4)


def test_fused_kernel_clean_tones():
    """Pure tones at known bins must detect exactly with 0 dB power."""
    p = L.LoraParams(sf=7)
    n = p.n
    bins = np.array([[0, 3, 64, 127, 5, 99]])
    t = np.arange(n)
    z = np.exp(2j * np.pi * bins[..., None] * t / n).astype(np.complex64)
    idx, power, pav = fused_rotate_detect(
        jnp.asarray(z.real), jnp.asarray(z.imag),
        jnp.zeros(1, jnp.float32), jnp.zeros((1, 6), jnp.float32),
        interpret=True)
    np.testing.assert_array_equal(np.asarray(idx), bins)
    assert np.abs(np.asarray(power)).max() < 0.01


def test_demod_backend_pallas_interpret_equals_jnp():
    """demodulate_tones(backend=...) consistency through the public API."""
    import lora_sdr_lightweight_standalone_library_clean_tpu.ops.pallas_detect as pd
    p = L.LoraParams(sf=7)
    payload = np.arange(16, dtype=np.uint8)
    re, im = L.modulate(L.encode(payload[None]), p)
    dr, di = L.dechirp(re, im, p)
    want = L.demodulate_tones(dr, di, p, backend="jnp")
    # monkeypatch interpret mode so backend="pallas" runs on CPU
    orig = pd.fused_rotate_detect
    try:
        pd.fused_rotate_detect = lambda *a, **k: orig(*a, interpret=True, **k)
        got = L.demodulate_tones(dr, di, p, backend="pallas")
    finally:
        pd.fused_rotate_detect = orig
    np.testing.assert_array_equal(np.asarray(got.symbols),
                                  np.asarray(want.symbols))
    assert int(got.sync_word[0]) == int(want.sync_word[0])
