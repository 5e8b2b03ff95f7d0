"""Fused Pallas streaming-scan kernel: equivalence with the jnp overlap-save
scan (interpret mode on CPU; the real kernel runs on TPU via bench.py).

The jnp reference path and the kernel factor big DFTs differently
(ops/dft.py picks near-square factors, the kernel fixes n2=128 for full
lanes), so float orderings differ in ULPs: power comparisons use a small dB
tolerance and argmax equality is asserted on every window with a
distinguishable peak (pure-noise windows may flip between near-equal bins,
which the power gate discards anyway).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")

import lora_sdr_lightweight_standalone_library_clean_tpu as L
from lora_sdr_lightweight_standalone_library_clean_tpu.parallel.streaming import (
    _scan_block, stream_scan, find_packet_starts)
from lora_sdr_lightweight_standalone_library_clean_tpu.ops.pallas_stream import (
    stream_window_detect, stream_supported)


def _stream_with_packet(p, n_sym=37, seed=0, amp=0.5):
    rng = np.random.default_rng(seed)
    total = p.step * n_sym
    r = rng.standard_normal(total).astype(np.float32) * 0.05
    i = rng.standard_normal(total).astype(np.float32) * 0.05
    syms = L.encode(np.arange(8, dtype=np.uint8)[None])
    re, im = L.modulate(jnp.asarray(syms), p)
    cut = min(total, re.shape[-1])
    r[:cut] += amp * np.asarray(re)[0][:cut]
    i[:cut] += amp * np.asarray(im)[0][:cut]
    return r, i


@pytest.mark.parametrize("sf,osr,stride_div", [
    (7, 1, 1), (7, 1, 4), (8, 1, 2), (9, 1, 4),   # dense DFT regime
    (10, 1, 4), (12, 1, 4),                        # factored DFT regime
    (7, 2, 4), (8, 4, 4),                          # decimated oversampling
])
def test_stream_kernel_matches_jnp_scan(sf, osr, stride_div):
    p = L.LoraParams(sf=sf, osr=osr)
    stride = p.step // stride_div
    # the auto gate takes the kernel at every eligible size (r5 static
    # crossover; a cached first-call race can override it per (n, stride)
    # — stream_supported docstring).  The kernel itself must stay
    # correct at every size, forced here via interpret.
    assert stream_supported(p.n, p.osr, p.step, stride, platform="tpu")
    r, i = _stream_with_packet(p, n_sym=21 if sf >= 10 else 37, seed=sf)
    halo = jnp.zeros(p.step, jnp.float32)
    want = _scan_block(jnp.asarray(r), jnp.asarray(i), halo, halo, p,
                       stride, backend="jnp")
    windows = r.shape[-1] // stride
    ext_r = jnp.concatenate([jnp.asarray(r), halo])
    ext_i = jnp.concatenate([jnp.asarray(i), halo])
    gi, gp, ga = stream_window_detect(ext_r, ext_i, p, stride, windows,
                                      interpret=True)
    wi, wp, wa = map(np.asarray, want)
    gi, gp, ga = map(np.asarray, (gi, gp, ga))
    assert gi.shape == wi.shape == (windows,)
    # argmax must agree wherever the peak is distinguishable (> 3 dB SNR);
    # noise windows may flip between near-equal bins under CPU matmul
    # reordering/bf16 fastmath (see tests/test_pallas.py docstring)
    clear = (wp - wa) > 3.0
    assert clear.any()
    np.testing.assert_array_equal(gi[clear], wi[clear])
    np.testing.assert_allclose(gp, wp, atol=0.05)
    np.testing.assert_allclose(ga, wa, atol=0.05)


def test_stream_scan_backend_pallas_finds_same_packets():
    """End-to-end: find_packet_starts over the kernel-backed scan flags the
    same packet starts as the jnp-backed scan."""
    import lora_sdr_lightweight_standalone_library_clean_tpu.ops.pallas_stream as ps
    p = L.LoraParams(sf=7)
    stride = p.step // 4
    r, i = _stream_with_packet(p, seed=11, amp=1.0)
    want = stream_scan(jnp.asarray(r), jnp.asarray(i), p, stride=stride,
                       backend="jnp")
    orig = ps.stream_window_detect
    try:
        ps.stream_window_detect = lambda *a, **k: orig(
            *a, **{**k, "interpret": True})
        got = stream_scan(jnp.asarray(r), jnp.asarray(i), p, stride=stride,
                          backend="pallas")
    finally:
        ps.stream_window_detect = orig
    km, ks = find_packet_starts(
        type(want)(got[0], got[1], got[2]), p, stride=stride)
    jm, js = find_packet_starts(want, p, stride=stride)
    np.testing.assert_array_equal(np.asarray(km), np.asarray(jm))
    np.testing.assert_array_equal(np.asarray(ks)[np.asarray(km)],
                                  np.asarray(js)[np.asarray(jm)])
    assert int(np.asarray(km).sum()) >= 1


def test_stream_kernel_short_stream_padding():
    """Streams shorter than one grid step are zero-padded, not mis-read."""
    p = L.LoraParams(sf=7)
    stride = p.step
    r, i = _stream_with_packet(p, n_sym=5, seed=3, amp=1.0)
    halo = jnp.zeros(p.step, jnp.float32)
    want = _scan_block(jnp.asarray(r), jnp.asarray(i), halo, halo, p,
                       stride, backend="jnp")
    ext_r = jnp.concatenate([jnp.asarray(r), halo])
    ext_i = jnp.concatenate([jnp.asarray(i), halo])
    gi, gp, ga = stream_window_detect(ext_r, ext_i, p, stride, 5,
                                      interpret=True)
    np.testing.assert_array_equal(np.asarray(gi), np.asarray(want[0]))
    np.testing.assert_allclose(np.asarray(gp), np.asarray(want[1]),
                               atol=0.05)
