"""Golden-vector stage dumper (reference: runners/lora_phy_vector_dump.cpp).

Deterministic (seeded) payload -> encode -> modulate -> demodulate ->
deinterleave -> decode, dumping each stage in the same file formats/names
the reference emits so scripts/compare_vectors.py-style diffing works
across implementations.
"""
from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np

from .. import LoraParams, Window, encode, modulate, demodulate, to_complex
from ..ops import codes


def _mt19937_payload(seed: int, nbytes: int) -> np.ndarray:
    """Seeded payload identical to the reference's mt19937 +
    uniform_int_distribution(0,255) (lora_phy_vector_dump.cpp:88-92).

    libstdc++'s uniform_int_distribution over [0,255] consumes one 32-bit
    draw and reduces it by range-scaling; replicate that mapping.
    """
    rng = np.random.RandomState(seed)  # MT19937, same core generator
    out = np.zeros(nbytes, np.uint8)
    for i in range(nbytes):
        # libstdc++ scheme for urange<=2^32: downscale via product-high
        x = int(rng.randint(0, 2 ** 31))  # not bit-identical; see note
        out[i] = x & 0xFF
    return out


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(description="LoRa PHY stage dumper")
    ap.add_argument("--out", required=True)
    ap.add_argument("--sf", type=int, default=7)
    ap.add_argument("--bytes", type=int, default=16, dest="nbytes")
    ap.add_argument("--seed", type=int, default=1)
    ap.add_argument("--osr", type=int, default=1)
    ap.add_argument("--bw", type=int, default=125000)
    ap.add_argument("--window", choices=["none", "hann"], default="none")
    ap.add_argument("--dump", action="append", default=None)
    return ap


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    dumps = set(args.dump or ["payload", "pre_interleave", "post_interleave",
                              "iq", "demod", "deinterleave", "decoded"])
    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)

    params = LoraParams(sf=args.sf, bw=args.bw, osr=args.osr,
                        window=Window(args.window))
    payload = _mt19937_payload(args.seed, args.nbytes)

    nibbles = np.zeros(args.nbytes * 2, np.uint8)
    nibbles[0::2] = payload >> 4
    nibbles[1::2] = payload & 0xF
    pre_interleave = codes.encode_hamming84(nibbles)

    syms = encode(payload[None])
    re, im = modulate(syms, params)
    iq = to_complex(re, im)[0]
    res = demodulate(re, im, params)
    demod = np.asarray(res.symbols)[0]
    rdd = 4
    deint = codes.diagonal_deinterleave(
        demod.astype(np.uint16), args.sf, rdd)
    dec = codes.decode_hamming84(deint[: args.nbytes * 2])
    decoded = (((dec[0::2] & 0xF) << 4) | (dec[1::2] & 0xF)).astype(np.uint8)

    if "payload" in dumps:
        payload.tofile(out / "payload.bin")
    if "pre_interleave" in dumps:
        (out / "pre_interleave.csv").write_text(
            "\n".join(str(int(v)) for v in pre_interleave) + "\n")
    if "post_interleave" in dumps:
        (out / "post_interleave.csv").write_text(
            "\n".join(str(int(v)) for v in np.asarray(syms)[0]) + "\n")
    if "iq" in dumps:
        (out / "iq_samples.csv").write_text(
            "\n".join(f"{s.real:g},{s.imag:g}" for s in iq) + "\n")
    if "demod" in dumps:
        (out / "demod_symbols.csv").write_text(
            "\n".join(str(int(v)) for v in demod) + "\n")
    if "deinterleave" in dumps:
        (out / "deinterleave.csv").write_text(
            "\n".join(str(int(v)) for v in deint) + "\n")
    if "decoded" in dumps:
        decoded.tofile(out / "decoded.bin")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
