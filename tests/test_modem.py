"""Modem API tests: codec goldens, e2e roundtrips, sync word, offsets, batching."""
import base64

import numpy as np
import pytest

import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")

import lora_sdr_lightweight_standalone_library_clean_tpu as L
from lora_sdr_lightweight_standalone_library_clean_tpu.ops import codes
import oracle


def test_encode_golden_deadbeef():
    """lora_encode(0xDEADBEEF) == reference symbol vector
    (roundtrip_test.cpp:30-31)."""
    payload = np.frombuffer(base64.b64decode("3q2+7w=="), np.uint8)
    sym_bytes = np.frombuffer(base64.b64decode("jQAuAJoAjQBLAC4ALgD/AA=="),
                              np.uint8)
    expected = sym_bytes[0::2].astype(np.uint16) | (
        sym_bytes[1::2].astype(np.uint16) << 8)
    syms = np.asarray(L.encode(payload))
    np.testing.assert_array_equal(syms, expected)
    dec, _ = L.decode(expected[None])
    np.testing.assert_array_equal(np.asarray(dec)[0], payload)


@pytest.mark.parametrize("profile", L.STOCK_PROFILES,
                         ids=lambda p: p["name"])
def test_e2e_chain(profile):
    """encode -> modulate -> dechirp -> demod -> decode per profile
    (mirrors tests/e2e_chain_test.cpp:62-114).  bw_scale>1 profiles cannot
    roundtrip payloads (SURVEY §4.4.2) — there the detected bins must equal
    (sym*bw_scale) mod N, reproducing observed reference behaviour."""
    p = L.params_from_profile(profile)
    payload = np.arange(32, dtype=np.uint8)
    syms = L.encode(payload[None])
    re, im = L.modulate(syms, p)
    assert re.shape[-1] == (syms.shape[-1] + 2) * p.step
    dr, di = L.dechirp(re, im, p)
    res = L.demodulate_tones(dr, di, p)
    if p.bw_scale == 1:
        dec, _ = L.decode(res.symbols)
        np.testing.assert_array_equal(np.asarray(dec)[0], payload)
    else:
        exp = (np.asarray(syms)[0].astype(np.int64) * p.bw_scale) % p.n
        np.testing.assert_array_equal(np.asarray(res.symbols)[0], exp)


@pytest.mark.slow
def test_modulate_mxu_matches_vpu():
    """The MXU tone-matmul synthesis (the osr==1 default) must agree with
    the closed-form VPU phases — both are float32 roundings of the same
    exact integer phase.  Tolerance covers CPU bf16-fastmath matmul drift
    (see tests/test_pallas.py docstring); in true f32 the paths agree to
    ~1e-6."""
    from lora_sdr_lightweight_standalone_library_clean_tpu.ops.chirp import (
        modulate_ri)
    rng = np.random.default_rng(11)
    for sf, bs in [(7, 1), (8, 1), (9, 2), (11, 4), (12, 4)]:
        p = L.LoraParams(sf=sf, bw=bs * 125000)
        syms = rng.integers(0, 2 * p.n, (2, 5)).astype(np.int32)
        rv, iv = modulate_ri(syms, p, method="vpu")
        rm, im = modulate_ri(syms, p, method="mxu")
        np.testing.assert_allclose(np.asarray(rm), np.asarray(rv),
                                   atol=0.02, err_msg=f"sf={sf} bs={bs}")
        np.testing.assert_allclose(np.asarray(im), np.asarray(iv),
                                   atol=0.02, err_msg=f"sf={sf} bs={bs}")
        # and the carried packet phase stays exact: symbol boundaries of
        # the two paths agree in sign (bs odd alternates, bs even is +1)
        re2, _ = modulate_ri(np.zeros((1, 0), np.int32), p, amplitude=0.25,
                             method="mxu")
        assert re2.shape == (1, 2 * p.step)
        assert float(jnp.max(jnp.abs(re2))) <= 0.25 + 1e-6


@pytest.mark.slow
def test_modulate_matches_sequential_oracle():
    """Vectorized closed-form phases vs the float32 sequential C emulation."""
    rng = np.random.default_rng(4)
    for sf, osr, bs in [(7, 1, 1), (9, 1, 1), (7, 2, 1), (8, 1, 2)]:
        p = L.LoraParams(sf=sf, osr=osr, bw=bs * 125000)
        syms = rng.integers(0, min(2 * p.n, 256), 6).astype(np.int32)
        re, im = L.modulate(syms[None], p)
        mine = np.asarray(re)[0] + 1j * np.asarray(im)[0]
        ref = oracle.modulate_f32(list(syms), sf, osr, bs)
        if osr == 1:
            err = np.abs(mine - ref)
            # identical up to f32 drift except wrap-boundary ties (PARITY.md)
            assert float(np.quantile(err, 0.75)) < 0.02, (sf, osr, bs)
        else:
            # osr>1 flips phase by ±pi at float wrap-boundary ties in most
            # symbols (PARITY.md); the decode-level invariant must hold:
            # both IQ streams demodulate to identical bins.
            rr, ri = L.from_complex(ref[None])
            a = L.demodulate_tones(*L.dechirp(jnp.asarray(mine.real[None]),
                                              jnp.asarray(mine.imag[None]), p), p)
            b = L.demodulate_tones(*L.dechirp(rr, ri, p), p)
            sa = np.asarray(a.symbols).astype(np.int64)
            sb = np.asarray(b.symbols).astype(np.int64)
            # a tie that lands mid-symbol can straddle a bin boundary and
            # flip one marginal detection by +-1 (single codeword bit ->
            # Hamming-corrected; payload roundtrip asserted elsewhere)
            diff = np.minimum((sa - sb) % p.n, (sb - sa) % p.n)
            assert diff.max() <= 1, (sf, osr, bs)
            assert (diff == 0).mean() >= 0.8


@pytest.mark.parametrize("sync", [0x12, 0x34])
def test_sync_word_modulate_demod(sync):
    """Sync word roundtrip with a correctly sized 256-sample buffer (the
    reference fixture is one sample short, SURVEY §4.4.3).

    Only low-valued sync words roundtrip: the estimator folds the sync bin
    values into its CFO (phy.cpp:137-143), so e.g. 0xAB biases detection by
    -0.66 bins and mis-extracts — in the reference too (PARITY.md)."""
    p = L.LoraParams(sf=7, sync_word=sync)
    re, im = L.modulate(np.zeros((1, 0), np.int32), p)
    assert re.shape[-1] == 2 * p.n
    dr, di = L.dechirp(re, im, p)
    res = L.demodulate_tones(dr, di, p)
    assert int(res.sync_word[0]) == sync
    assert res.symbols.shape[-1] == 0


def test_amplitude_clamp():
    p = L.LoraParams(sf=7)
    re, im = L.modulate(np.zeros((1, 1), np.int32), p, amplitude=5.0)
    mag = np.hypot(np.asarray(re), np.asarray(im))
    assert float(mag.max()) <= 1.0 + 1e-6


def test_normalization_path():
    """Amplitude > 1 inputs are peak-normalized before demod
    (LoRaDemod.cpp:60-78)."""
    p = L.LoraParams(sf=7)
    payload = np.arange(8, dtype=np.uint8)
    syms = L.encode(payload[None])
    re, im = L.modulate(syms, p)
    dr, di = L.dechirp(re, im, p)
    res = L.demodulate_tones(3.7 * dr, 3.7 * di, p)
    dec, _ = L.decode(res.symbols)
    np.testing.assert_array_equal(np.asarray(dec)[0], payload)


@pytest.mark.slow
def test_batched_demod_consistency():
    """A batch of different packets demodulates identically to per-packet."""
    p = L.LoraParams(sf=8)
    rng = np.random.default_rng(5)
    payloads = rng.integers(0, 256, (4, 16)).astype(np.uint8)
    syms = L.encode(payloads)
    re, im = L.modulate(syms, p)
    dr, di = L.dechirp(re, im, p)
    batched = L.demodulate_tones(dr, di, p)
    dec, _ = L.decode(batched.symbols)
    np.testing.assert_array_equal(np.asarray(dec), payloads)
    for i in range(4):
        single = L.demodulate_tones(dr[i], di[i], p)
        np.testing.assert_array_equal(np.asarray(single.symbols),
                                      np.asarray(batched.symbols)[i])


def test_crc_metric_flow():
    """decode() verifies the trailing CRC like phy.cpp:252-259."""
    payload = np.zeros(10, np.uint8)
    payload[:2] = [0xAA, 0xBB]           # 2-byte prefix excluded from CRC
    body = payload[2:8]
    crc = codes.sx1272_data_checksum(body)
    payload[8] = crc & 0xFF
    payload[9] = crc >> 8
    syms = L.encode(payload[None])
    dec, ok = L.decode(syms)
    assert bool(np.asarray(ok)[0])
    # corrupt one body byte -> CRC fails
    bad = payload.copy()
    bad[4] ^= 0xFF
    dec, ok = L.decode(L.encode(bad[None]))
    assert not bool(np.asarray(ok)[0])


def test_estimate_and_compensate_offsets():
    """Reference estimator semantics (phy.cpp:81-148): on symbol-0 preamble
    tones with a +0.25-bin continuous CFO, coarse = 0.25/N from the
    fractional index and fine = 0.25/N from the inter-symbol phase delta,
    so cfo ≈ 0.5/N; compensation then leaves decode clean."""
    p = L.LoraParams(sf=8)
    payload = np.arange(16, dtype=np.uint8)
    syms = L.encode(payload[None])
    re, im = L.modulate(syms, p)
    dr, di = L.dechirp(re, im, p)
    # continuous +0.25 bin rotation on the dechirped tones
    n = dr.shape[-1]
    ph = 2 * np.pi * 0.25 * np.arange(n) / p.n
    rot = np.exp(1j * ph).astype(np.complex64)
    iq = (np.asarray(dr)[0] + 1j * np.asarray(di)[0]) * rot
    rr, ri = L.from_complex(iq[None])
    # preamble = two dechirped symbol-0 tones with the same +0.25-bin
    # rotation (the reference formula's intended input)
    pre = rot[: 2 * p.step].astype(np.complex64)
    prr, pri = L.from_complex(pre[None])
    est = L.estimate_offsets(prr, pri, p)
    # coarse (fractional-index) + fine (phase-delta) ≈ 0.3/N, positive
    assert 0.1 / p.n < float(est.cfo[0]) < 1.0 / p.n
    # compensation of the (tiny, reference-faithful) estimate keeps the
    # chain decodable
    est_full = L.estimate_offsets(rr[..., : 2 * p.step],
                                  ri[..., : 2 * p.step], p)
    cr, ci = L.compensate_offsets(rr, ri, p, est_full)
    res = L.demodulate_tones(cr, ci, p, normalize=False)
    dec, _ = L.decode(res.symbols)
    np.testing.assert_array_equal(np.asarray(dec)[0], payload)


def test_jit_cache_stability():
    """Same-shape calls must not retrace (the TPU analogue of the reference's
    zero-runtime-allocation rule, SURVEY §5.2)."""
    p = L.LoraParams(sf=7)

    traces = 0

    @jax.jit
    def pipeline(re, im):
        nonlocal traces
        traces += 1
        res = L.demodulate_tones(*L.dechirp(re, im, p), p)
        return res.symbols

    payload = np.arange(8, dtype=np.uint8)
    re, im = L.modulate(L.encode(payload[None]), p)
    pipeline(re, im)
    pipeline(re + 0, im + 0)
    assert traces == 1


def test_modulate_dechirped_equals_modulate_then_dechirp():
    """The fused producer (modulate_dechirped) matches the two-step
    modulate -> external dechirp chain on every backend; on TPU the
    Pallas fused-dechirp variant is additionally covered by
    tests/test_pallas.py::test_tx_kernel_matches_mxu_modulate."""
    for sf in (7, 10):
        p = L.LoraParams(sf=sf)
        rng = np.random.default_rng(sf)
        syms = rng.integers(0, 1 << sf, (3, 12)).astype(np.uint16)
        fr, fi = L.modulate_dechirped(syms, p, amplitude=0.5)
        dr, di = L.dechirp(*L.modulate(syms, p, amplitude=0.5), p)
        np.testing.assert_allclose(np.asarray(fr), np.asarray(dr), atol=4e-6)
        np.testing.assert_allclose(np.asarray(fi), np.asarray(di), atol=4e-6)
