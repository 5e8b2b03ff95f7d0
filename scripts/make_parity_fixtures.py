#!/usr/bin/env python3
"""Regenerate reference-parity fixtures from a built reference tree.

Builds the reference's ``lora_phy_vector_dump`` (if needed), runs it for a
matrix of profiles, and stores each stage dump as a compressed ``.npz`` under
``tests/vectors/``.  These fixtures carry *behavioural data produced by the
reference binary* (payload bytes, encoded symbols, float32 IQ, the reference's
own full-path demod output, and decoded bytes) so the TPU library's parity
tests run standalone.

Usage:  python scripts/make_parity_fixtures.py [--reference /root/reference]
"""
from __future__ import annotations

import argparse
import subprocess
import tempfile
from pathlib import Path

import numpy as np

CASES = [
    # (tag, sf, bw, osr, window, bytes)
    ("sf7_bw125", 7, 125000, 1, "none", 16),
    ("sf8_bw125", 8, 125000, 1, "none", 16),
    ("sf9_bw250", 9, 250000, 1, "none", 8),
    ("sf10_bw250", 10, 250000, 1, "none", 8),
    ("sf11_bw500", 11, 500000, 1, "none", 4),
    ("sf12_bw500", 12, 500000, 1, "none", 4),
    ("sf7_bw125_osr2", 7, 125000, 2, "none", 16),
    ("sf7_bw125_hann", 7, 125000, 1, "hann", 16),
]


def build_reference(ref: Path, build: Path) -> Path:
    binary = build / "lora_phy_vector_dump"
    if binary.exists():
        return binary
    build.mkdir(parents=True, exist_ok=True)
    subprocess.run(["cmake", "-DCMAKE_BUILD_TYPE=Release", str(ref),
                    "-G", "Ninja"], cwd=build, check=True,
                   capture_output=True)
    subprocess.run(["ninja", "lora_phy_vector_dump"], cwd=build, check=True,
                   capture_output=True)
    return binary


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reference", default="/root/reference")
    ap.add_argument("--build", default="/tmp/refbuild")
    ap.add_argument("--out", default=None)
    ap.add_argument("--seed", type=int, default=1)
    args = ap.parse_args()

    out_dir = Path(args.out or Path(__file__).resolve().parent.parent /
                   "tests" / "vectors")
    out_dir.mkdir(parents=True, exist_ok=True)
    binary = build_reference(Path(args.reference), Path(args.build))

    for tag, sf, bw, osr, window, nbytes in CASES:
        with tempfile.TemporaryDirectory() as td:
            cmd = [str(binary), f"--sf={sf}", f"--bw={bw}", f"--osr={osr}",
                   f"--seed={args.seed}", f"--bytes={nbytes}", f"--out={td}"]
            if window != "none":
                cmd.append(f"--window={window}")
            subprocess.run(cmd, check=True)
            td = Path(td)
            iq = np.loadtxt(td / "iq_samples.csv", delimiter=",",
                            dtype=np.float32)
            np.savez_compressed(
                out_dir / f"ref_{tag}.npz",
                sf=sf, bw=bw, osr=osr, window=window, seed=args.seed,
                payload=np.fromfile(td / "payload.bin", np.uint8),
                encoded=np.loadtxt(td / "post_interleave.csv",
                                   dtype=np.int64).astype(np.uint16),
                iq=(iq[:, 0] + 1j * iq[:, 1]).astype(np.complex64),
                demod=np.loadtxt(td / "demod_symbols.csv",
                                 dtype=np.int64).astype(np.uint16),
                decoded=np.fromfile(td / "decoded.bin", np.uint8),
            )
            print("wrote", out_dir / f"ref_{tag}.npz")


if __name__ == "__main__":
    main()
