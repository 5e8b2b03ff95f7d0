"""CLI runner integration tests (subprocess, mirroring
tests/lorawan_roundtrip.py and the tx->rx wire format)."""
import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent
PKG = "lora_sdr_lightweight_standalone_library_clean_tpu"
ENV = dict(os.environ, JAX_PLATFORMS="cpu",
           PYTHONPATH=str(REPO) + os.pathsep + os.environ.get("PYTHONPATH", ""))


def run(mod, *args, timeout=240):
    return subprocess.run(
        [sys.executable, "-m", f"{PKG}.runners.{mod}", *args],
        capture_output=True, text=False, cwd=REPO, env=ENV, timeout=timeout)


def test_tx_rx_pipe(tmp_path):
    """tx hex -> IQ file -> rx hex roundtrip (tones path)."""
    payload = "DEADBEEFCAFEF00D"
    iq = tmp_path / "iq.f32"
    r = run("tx", f"--payload={payload}", "--sf=7", f"--out={iq}")
    assert r.returncode == 0, r.stderr.decode()
    assert iq.stat().st_size == (8 * 2 + 2) * 128 * 8  # (16+2 syms)*N*2*f32
    r = run("rx", f"--in={iq}", "--sf=7", "--report-offsets")
    assert r.returncode == 0, r.stderr.decode()
    assert r.stdout.decode().strip() == payload
    assert "sync=0x12" in r.stderr.decode()


def test_tx_stdout_rx_stdin(tmp_path):
    r1 = run("tx", "--payload=0011AA", "--sf=8", "--out=-")
    assert r1.returncode == 0
    r2 = subprocess.run(
        [sys.executable, "-m", f"{PKG}.runners.rx", "--in=-", "--sf=8"],
        input=r1.stdout, capture_output=True, cwd=REPO, env=ENV, timeout=240)
    assert r2.returncode == 0, r2.stderr.decode()
    assert r2.stdout.decode().strip() == "0011AA"


def test_lorawan_roundtrip_runner():
    """5 random payload roundtrips (tests/lorawan_roundtrip.py:13-22)."""
    rng = np.random.default_rng(21)
    for _ in range(5):
        payload = bytes(rng.integers(0, 256, 8).astype(np.uint8)).hex()
        r = run("lorawan_roundtrip", f"--payload={payload}")
        assert r.returncode == 0, r.stderr.decode()
        assert "OK" in r.stderr.decode()


def test_vector_dump_runner(tmp_path):
    out = tmp_path / "vecs"
    r = run("vector_dump", f"--out={out}", "--sf=7", "--bytes=8", "--seed=3")
    assert r.returncode == 0, r.stderr.decode()
    for name in ["payload.bin", "pre_interleave.csv", "post_interleave.csv",
                 "iq_samples.csv", "demod_symbols.csv", "deinterleave.csv",
                 "decoded.bin"]:
        assert (out / name).exists(), name
    payload = np.fromfile(out / "payload.bin", np.uint8)
    assert payload.size == 8
    syms = np.loadtxt(out / "post_interleave.csv", dtype=np.int64)
    assert syms.size == 16
