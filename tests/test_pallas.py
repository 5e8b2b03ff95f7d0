"""Fused Pallas detect kernel: equivalence with the jnp path (interpret
mode on CPU; the real kernel is exercised on TPU by bench.py and
scripts/tpu_validate.py).

Tolerance note: XLA CPU float32 matmuls are not run-to-run stable — the
reduction split depends on thread-pool state, and on AMX-class hosts
onednn can drop to bf16 fastmath (observed: ~2e-3 absolute drift on unit
IQ, dB deltas up to ~0.03).  Power comparisons therefore use atol=0.05 dB
(numerically meaningless at detection level), and argmax equality on
*noise* inputs allows flips only between bins whose |bin|^2 agree to 1e-2
relative — ties under bf16 reordering.  Signal-bearing inputs still
require exact index equality."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")

import lora_sdr_lightweight_standalone_library_clean_tpu as L
from lora_sdr_lightweight_standalone_library_clean_tpu.ops.detect import detect_ri
from lora_sdr_lightweight_standalone_library_clean_tpu.ops.pallas_detect import (
    fused_rotate_detect)


def _assert_idx_tie_robust(got_idx, want, mag2):
    """Indexes must match except where the two picks are float-order ties."""
    gi = np.asarray(got_idx)
    wi = np.asarray(want.index)
    flat_g = gi.reshape(-1)
    flat_w = wi.reshape(-1)
    m2 = np.asarray(mag2).reshape(-1, np.asarray(mag2).shape[-1])
    for k in np.nonzero(flat_g != flat_w)[0]:
        a, b = m2[k, flat_g[k]], m2[k, flat_w[k]]
        assert abs(a - b) <= 1e-2 * max(a, b), (
            f"argmax mismatch beyond tie tolerance at row {k}: "
            f"{flat_g[k]} ({a}) vs {flat_w[k]} ({b})")


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

    from lora_sdr_lightweight_standalone_library_clean_tpu.ops.dft import dft_ri
    xr, xi = dft_ri(jnp.asarray(fr), jnp.asarray(fi))
    _assert_idx_tie_robust(idx, det, xr * xr + xi * xi)
    np.testing.assert_allclose(np.asarray(power), np.asarray(det.power),
                               rtol=1e-4, atol=0.05)
    np.testing.assert_allclose(np.asarray(pav), np.asarray(det.power_avg),
                               rtol=1e-4, atol=0.05)


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


@pytest.mark.parametrize("sf", [7, 9, 10, 12])
def test_rx_kernel_matches_jnp_path(sf):
    """The fully-fused RX kernel (timing shift + rotate + DFT + detect)
    must reproduce the jnp pipeline on real packets across the dense and
    factored DFT regimes, including edge timing clamps."""
    from lora_sdr_lightweight_standalone_library_clean_tpu.models.modem import (
        _timing_shifted_windows)
    from lora_sdr_lightweight_standalone_library_clean_tpu.ops.pallas_rx import (
        rx_window_detect)
    p = L.LoraParams(sf=sf)
    n, step = p.n, p.step
    rng = np.random.default_rng(sf)
    B = 8
    payloads = rng.integers(0, 256, (B, 8)).astype(np.uint8)
    re, im = L.modulate(L.encode(payloads), p)
    dr, di = L.dechirp(re, im, p)
    dr = np.asarray(dr) + rng.standard_normal(dr.shape).astype(np.float32) * 0.03
    di = np.asarray(di) + rng.standard_normal(di.shape).astype(np.float32) * 0.03
    S = dr.shape[-1] // step
    t_off = rng.integers(-step, step + 1, B).astype(np.int32)
    t_off[:3] = [0, step, -step]
    rate = (rng.standard_normal(B) * 1e-4).astype(np.float32)
    scale = rng.uniform(0.5, 1.0, B).astype(np.float32)

    zr, zi = _timing_shifted_windows(jnp.asarray(dr), jnp.asarray(di),
                                     jnp.asarray(t_off), S, step, p.osr, n)
    zr = zr * scale[:, None, None]
    zi = zi * scale[:, None, None]
    ph = (rate[:, None, None]
          * (np.arange(S, dtype=np.float32)[None, :, None] * n
             + t_off[:, None, None].astype(np.float32)
             + np.arange(n, dtype=np.float32)))
    c, s_ = np.cos(ph), np.sin(ph)
    fr = zr * c - zi * s_
    fi = zr * s_ + zi * c
    want = detect_ri(jnp.asarray(fr), jnp.asarray(fi))

    gi, gp, ga = rx_window_detect(
        jnp.asarray(dr), jnp.asarray(di), jnp.asarray(t_off),
        jnp.asarray(rate), jnp.asarray(scale),
        jnp.ones(n, jnp.float32), jnp.zeros(n, jnp.float32), p,
        interpret=True)
    np.testing.assert_array_equal(np.asarray(gi), np.asarray(want.index))
    np.testing.assert_allclose(np.asarray(gp), np.asarray(want.power),
                               rtol=1e-3, atol=0.05)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(want.power_avg),
                               rtol=1e-3, atol=0.05)


def test_demod_backend_rx_kernel_equals_jnp():
    """demodulate_tones / demodulate via the fused RX kernel decode the
    same symbols and sync word as the jnp path (interpret mode on CPU)."""
    import lora_sdr_lightweight_standalone_library_clean_tpu.ops.pallas_rx as prx
    p = L.LoraParams(sf=7)
    rng = np.random.default_rng(3)
    payloads = rng.integers(0, 256, (4, 16)).astype(np.uint8)
    re, im = L.modulate(L.encode(payloads), p)
    dr, di = L.dechirp(re, im, p)
    want = L.demodulate_tones(dr, di, p, backend="jnp")
    want_full = L.demodulate(re, im, p, backend="jnp")
    orig = prx.rx_window_detect
    try:
        prx.rx_window_detect = lambda *a, **k: orig(
            *a, **{**k, "interpret": True})
        got = L.demodulate_tones(dr, di, p, backend="pallas_rx")
        full = L.demodulate(re, im, p, backend="pallas_rx")
    finally:
        prx.rx_window_detect = orig
    np.testing.assert_array_equal(np.asarray(got.symbols),
                                  np.asarray(want.symbols))
    np.testing.assert_array_equal(np.asarray(got.sync_word),
                                  np.asarray(want.sync_word))
    # the dechirping full-RX path (downchirp folded into the kernel's
    # multiplier) must agree with its jnp twin symbol-for-symbol
    np.testing.assert_array_equal(np.asarray(full.symbols),
                                  np.asarray(want_full.symbols))
    np.testing.assert_array_equal(np.asarray(full.sync_word),
                                  np.asarray(want_full.sync_word))
    # and the tones path round-trips the payloads bit-exactly
    dec, _ = L.decode(got.symbols)
    np.testing.assert_array_equal(np.asarray(dec), payloads)


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


@pytest.mark.slow
@pytest.mark.parametrize("sf,osr", [(7, 2), (7, 4), (9, 2), (10, 4)])
def test_rx_kernel_osr_matches_jnp_path(sf, osr):
    """osr > 1: the kernel's in-VMEM phase select + decimated-domain shift
    must reproduce the jnp pipeline (decimation at the timing-shifted base,
    phy.cpp:218-229), including the phase-0 edge clamps."""
    from lora_sdr_lightweight_standalone_library_clean_tpu.models.modem import (
        _timing_shifted_windows)
    from lora_sdr_lightweight_standalone_library_clean_tpu.ops.pallas_rx import (
        rx_window_detect)
    p = L.LoraParams(sf=sf, osr=osr)
    n, step = p.n, p.step
    rng = np.random.default_rng(sf * 10 + osr)
    B = 6
    payloads = rng.integers(0, 256, (B, 4)).astype(np.uint8)
    re, im = L.modulate(L.encode(payloads), p)
    dr, di = L.dechirp(re, im, p)
    dr = np.asarray(dr) + rng.standard_normal(dr.shape).astype(np.float32) * 0.03
    di = np.asarray(di) + rng.standard_normal(di.shape).astype(np.float32) * 0.03
    S = dr.shape[-1] // step
    t_off = rng.integers(-step, step + 1, B).astype(np.int32)
    t_off[:4] = [0, step, -step, osr + 1]       # edges + non-zero phase
    rate = (rng.standard_normal(B) * 1e-4).astype(np.float32)
    scale = rng.uniform(0.5, 1.0, B).astype(np.float32)

    zr, zi = _timing_shifted_windows(jnp.asarray(dr), jnp.asarray(di),
                                     jnp.asarray(t_off), S, step, osr, n)
    zr = zr * scale[:, None, None]
    zi = zi * scale[:, None, None]
    ph = (rate[:, None, None]
          * (np.arange(S, dtype=np.float32)[None, :, None] * n
             + t_off[:, None, None].astype(np.float32) / osr
             + np.arange(n, dtype=np.float32)))
    c, s_ = np.cos(ph), np.sin(ph)
    fr = zr * c - zi * s_
    fi = zr * s_ + zi * c
    want = detect_ri(jnp.asarray(fr), jnp.asarray(fi))

    gi, gp, ga = rx_window_detect(
        jnp.asarray(dr), jnp.asarray(di), jnp.asarray(t_off),
        jnp.asarray(rate), jnp.asarray(scale),
        jnp.ones(n, jnp.float32), jnp.zeros(n, jnp.float32), p,
        interpret=True)
    np.testing.assert_array_equal(np.asarray(gi), np.asarray(want.index))
    np.testing.assert_allclose(np.asarray(gp), np.asarray(want.power),
                               rtol=1e-3, atol=0.05)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(want.power_avg),
                               rtol=1e-3, atol=0.05)


@pytest.mark.slow
@pytest.mark.parametrize("sf,bw,osr", [(9, 250000, 2), (12, 500000, 4)])
def test_wide_kernel_matches_jnp_wide(sf, bw, osr):
    """demodulate_wide via the fused full-rate kernel (ndft = N*osr, up to
    16384-point factored DFT) recovers the same symbols as the jnp wide
    path on the BW-250/500 profiles the reference cannot decode."""
    import lora_sdr_lightweight_standalone_library_clean_tpu.ops.pallas_rx as prx
    p = L.LoraParams(sf=sf, bw=bw, osr=osr)
    rng = np.random.default_rng(sf)
    B = 2
    nsym = 6
    syms = rng.integers(0, p.n, (B, nsym)).astype(np.uint16)
    re, im = L.modulate(syms, p)
    dr, di = L.dechirp(re, im, p)
    dr = np.asarray(dr) + rng.standard_normal(dr.shape).astype(np.float32) * 0.01
    di = np.asarray(di) + rng.standard_normal(di.shape).astype(np.float32) * 0.01

    want = L.demodulate_wide(jnp.asarray(dr), jnp.asarray(di), p,
                             backend="jnp")
    orig = prx.rx_window_detect
    try:
        prx.rx_window_detect = lambda *a, **k: orig(
            *a, **{**k, "interpret": True})
        got = L.demodulate_wide(jnp.asarray(dr), jnp.asarray(di), p,
                                backend="pallas_rx")
    finally:
        prx.rx_window_detect = orig
    np.testing.assert_array_equal(np.asarray(got.symbols),
                                  np.asarray(want.symbols))
    np.testing.assert_array_equal(np.asarray(got.symbols), syms)
    np.testing.assert_array_equal(np.asarray(got.sync_word),
                                  np.asarray(want.sync_word))


@pytest.mark.parametrize("sf", [7, 9, 11, 12])
def test_tx_kernel_matches_mxu_modulate(sf):
    """The Pallas TX kernel reproduces the XLA MXU tone-matmul synthesis
    (same exact-integer-phase identity) bit-for-bit in detection and within
    float tolerance in IQ, including the fused-dechirp variant.  sf <= 9
    exercises the dense (n, n) tone-table kernel, sf >= 11 the factored
    digit-table kernel (``_tx_kernel_factored``)."""
    from lora_sdr_lightweight_standalone_library_clean_tpu.ops.chirp import (
        modulate_ri, _with_sync_prelude, downchirp_ri)
    from lora_sdr_lightweight_standalone_library_clean_tpu.ops.pallas_tx \
        import tx_tone_synth
    p = L.LoraParams(sf=sf)
    rng = np.random.default_rng(sf)
    # full tone range so sf 11/12 exercise every w1/w2 digit-table row
    syms = rng.integers(0, 1 << sf, (4, 10)).astype(np.uint16)
    wr, wi = modulate_ri(syms, p, amplitude=0.75, method="mxu")
    allsyms = _with_sync_prelude(jnp.asarray(syms, jnp.int32), p)
    gr, gi = tx_tone_synth(allsyms, p, amplitude=0.75, interpret=True)
    np.testing.assert_allclose(np.asarray(gr), np.asarray(wr),
                               atol=2e-6, rtol=0)
    np.testing.assert_allclose(np.asarray(gi), np.asarray(wi),
                               atol=2e-6, rtol=0)

    # fused dechirp == modulate then external dechirp
    dr, di = L.dechirp(wr, wi, p)
    fr, fi = tx_tone_synth(allsyms, p, amplitude=0.75, dechirp=True,
                           interpret=True)
    np.testing.assert_allclose(np.asarray(fr), np.asarray(dr),
                               atol=4e-6, rtol=0)
    np.testing.assert_allclose(np.asarray(fi), np.asarray(di),
                               atol=4e-6, rtol=0)


@pytest.mark.slow
def test_wide_symbol_chunking_with_halo_skip_matches_single_shot():
    """The symbol-chunked wide path (1-symbol halos feeding the slab but
    excluded from DFT/detection via rx_window_detect's ``halo``) returns
    identical detections to the single-shot kernel, including packets
    with a timing shift that makes edge windows read into halo rows."""
    import lora_sdr_lightweight_standalone_library_clean_tpu.ops.pallas_rx as prx
    p = L.LoraParams(sf=9, bw=250_000, osr=2)
    rng = np.random.default_rng(7)
    B, nsym = 2, 14
    syms = rng.integers(0, p.n, (B, nsym)).astype(np.uint16)
    re, im = L.modulate(syms, p)
    dr, di = L.dechirp(re, im, p)
    dr = np.asarray(dr) + rng.standard_normal(dr.shape).astype(np.float32) * 0.01
    di = np.asarray(di) + rng.standard_normal(di.shape).astype(np.float32) * 0.01
    # inject a timing offset so shifted windows actually cross chunk
    # boundaries (|t| < step)
    dr = np.roll(dr, 37, axis=-1)
    di = np.roll(di, 37, axis=-1)

    orig_rwd = prx.rx_window_detect
    orig_ws = prx.wide_supported
    calls = []
    try:
        prx.rx_window_detect = lambda *a, **k: calls.append(
            k.get("halo", (0, 0))) or orig_rwd(
            *a, **{**k, "interpret": True})
        want = L.demodulate_wide(jnp.asarray(dr), jnp.asarray(di), p,
                                 backend="pallas_rx")
        # force the chunked path: reject anything above 8 slab rows
        prx.wide_supported = lambda n, osr, platform=None, s_real=8, \
            s_detect=None: orig_ws(n, osr, platform="tpu", s_real=s_real,
                                   s_detect=s_detect) and s_real <= 8
        calls.clear()
        got = L.demodulate_wide(jnp.asarray(dr), jnp.asarray(di), p,
                                backend="pallas_rx")
    finally:
        prx.rx_window_detect = orig_rwd
        prx.wide_supported = orig_ws
    # the chunked run really used lead/trail halos: the first chunk has
    # no lead, the last no trail, interiors both; widths vary (the r5
    # scheme sizes halos so each call's slab is a whole number of
    # sublane tiles where the stream allows)
    assert len(calls) >= 3, calls
    assert calls[0][0] == 0 and calls[0][1] >= 1, calls
    assert calls[-1][0] >= 1 and calls[-1][1] == 0, calls
    assert all(c[0] >= 1 and c[1] >= 1 for c in calls[1:-1]), calls
    np.testing.assert_array_equal(np.asarray(got.symbols),
                                  np.asarray(want.symbols))
    np.testing.assert_array_equal(np.asarray(got.sync_word),
                                  np.asarray(want.sync_word))


@pytest.mark.parametrize("sf,bw,osr", [
    (9, 250_000, 2),    # wide profile: q = 512 dense, wrap tone == 1
    (12, 500_000, 4),   # wide profile: q = 4096 factored, wrap tone == 1
    (7, 125_000, 2),    # bs=1: gated wrap tone (-1)^m, q = 256 dense
    (8, 125_000, 4),    # bs=1, osr=4: gated wrap tone, q = 1024 factored
])
def test_tx_osr_kernel_matches_vpu_modulate(sf, bw, osr):
    """The osr > 1 Pallas TX kernel (``_tx_call_osr``) reproduces the
    closed-form integer-phase VPU synthesis within float tolerance,
    including the per-symbol wrap gates (u^W(m) factorization, validated
    here over the full symbol range so both gate thresholds fire) and the
    fused-dechirp variant (VERDICT r3 task 5: the per-sample VPU trig this
    replaces was the dominant residual of the wide profiles' 14x gap;
    reference hot loop ChirpGenerator.hpp:33-48, osr handling
    LoRaMod.cpp:34-41)."""
    from lora_sdr_lightweight_standalone_library_clean_tpu.ops.chirp import (
        modulate_ri, _with_sync_prelude)
    from lora_sdr_lightweight_standalone_library_clean_tpu.ops.pallas_tx \
        import tx_tone_synth, tx_supported
    p = L.LoraParams(sf=sf, bw=bw, osr=osr)
    assert tx_supported(p.n, p.osr, platform="tpu", bw_scale=p.bw_scale)
    rng = np.random.default_rng(100 + sf)
    syms = rng.integers(0, 1 << sf, (3, 6)).astype(np.uint16)
    wr, wi = modulate_ri(syms, p, amplitude=0.75, method="vpu")
    allsyms = _with_sync_prelude(jnp.asarray(syms, jnp.int32), p)
    gr, gi = tx_tone_synth(allsyms, p, amplitude=0.75, interpret=True)
    np.testing.assert_allclose(np.asarray(gr), np.asarray(wr),
                               atol=2e-6, rtol=0)
    np.testing.assert_allclose(np.asarray(gi), np.asarray(wi),
                               atol=2e-6, rtol=0)

    dr, di = L.dechirp(wr, wi, p)
    fr, fi = tx_tone_synth(allsyms, p, amplitude=0.75, dechirp=True,
                           interpret=True)
    np.testing.assert_allclose(np.asarray(fr), np.asarray(dr),
                               atol=4e-6, rtol=0)
    np.testing.assert_allclose(np.asarray(fi), np.asarray(di),
                               atol=4e-6, rtol=0)


@pytest.mark.parametrize("sf", [7, 10])
def test_rx_kernel_slab_form_matches_direct(sf):
    """The osr == 1 slab window form (the LORA_RX_DIRECT_MIN A/B
    alternative; since r5 the direct form is the default at every size)
    must keep producing the direct form's detections.  The form is not a
    jit static arg — it is an import-time knob — so the caches are
    cleared around the forced-slab call to keep either form's compiled
    executable from leaking into the other's configs."""
    import lora_sdr_lightweight_standalone_library_clean_tpu.ops.pallas_rx as prx
    from lora_sdr_lightweight_standalone_library_clean_tpu.ops.pallas_rx import (
        rx_window_detect)
    p = L.LoraParams(sf=sf)
    n, step = p.n, p.step
    rng = np.random.default_rng(40 + sf)
    B = 4
    payloads = rng.integers(0, 256, (B, 8)).astype(np.uint8)
    re, im = L.modulate(L.encode(payloads), p)
    dr, di = L.dechirp(re, im, p)
    S = np.asarray(dr).shape[-1] // step
    t_off = rng.integers(-step, step + 1, B).astype(np.int32)
    t_off[:3] = [0, step, -step]
    rate = (rng.standard_normal(B) * 1e-4).astype(np.float32)
    scale = rng.uniform(0.5, 1.0, B).astype(np.float32)
    args = (jnp.asarray(dr), jnp.asarray(di), jnp.asarray(t_off),
            jnp.asarray(rate), jnp.asarray(scale),
            jnp.ones(n, jnp.float32), jnp.zeros(n, jnp.float32), p)

    want = rx_window_detect(*args, interpret=True)
    old = prx._DIRECT_MIN
    try:
        jax.clear_caches()
        prx._DIRECT_MIN = 10 ** 9           # force the slab form
        assert not prx._direct_windows(n)
        got = rx_window_detect(*args, interpret=True)
    finally:
        prx._DIRECT_MIN = old
        jax.clear_caches()
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


def test_tx_kernel_nonflat_output_branch():
    """The dense TX kernel's 3-D output fallback (taken when
    p_tile * s_real is not a sublane multiple — e.g. sf9's p_tile = 4
    with an odd symbol count) must match the VPU closed form like the
    flat 2-D branch does."""
    from lora_sdr_lightweight_standalone_library_clean_tpu.ops.chirp import (
        modulate_ri, _with_sync_prelude)
    from lora_sdr_lightweight_standalone_library_clean_tpu.ops.pallas_tx import (
        tx_tone_synth, _packets_per_tile, _round_up)
    p = L.LoraParams(sf=9)
    n_sym = 5                                  # s_total = 7 (odd)
    s_total = n_sym + 2
    assert (_packets_per_tile(p.n) * s_total) % 8 != 0, (
        "test no longer exercises the non-flat branch")
    rng = np.random.default_rng(77)
    syms = rng.integers(0, p.n, (3, n_sym)).astype(np.uint16)
    wr, wi = modulate_ri(syms, p, amplitude=0.75, method="vpu")
    allsyms = _with_sync_prelude(jnp.asarray(syms, jnp.int32), p)
    gr, gi = tx_tone_synth(allsyms, p, amplitude=0.75, interpret=True)
    np.testing.assert_allclose(np.asarray(gr), np.asarray(wr),
                               atol=2e-6, rtol=0)
    np.testing.assert_allclose(np.asarray(gi), np.asarray(wi),
                               atol=2e-6, rtol=0)
