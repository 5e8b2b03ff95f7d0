"""Sequential float32 oracle emulating the reference C implementation.

``gen_chirp_f32`` reproduces ``genChirp`` (ChirpGenerator.hpp:24-51) with
explicit float32 rounding at every step; it was validated bit-level
(max |diff| ~7e-7) against IQ dumped by the reference binary.  Used for
differential testing of the vectorized closed-form implementation without
shipping multi-MB IQ fixtures.
"""
from __future__ import annotations

import numpy as np

F32 = np.float32
PI = F32(3.14159265358979323846)


def gen_chirp_f32(n, osr, nn, f0, down, ampl, phase, bw_scale):
    """Sequential genChirp with float32 arithmetic. Returns (iq, phase)."""
    fmin = F32(-PI * F32(bw_scale) / F32(osr))
    fmax = F32(PI * F32(bw_scale) / F32(osr))
    fstep = F32((F32(2) * PI * F32(bw_scale)) / F32(n * osr * osr))
    f = F32(fmin + F32(f0))
    out = np.zeros(nn, np.complex64)
    for i in range(nn):
        f = F32(f + fstep)
        if f > fmax:
            f = F32(f - F32(fmax - fmin))
        phase = F32(phase - f) if down else F32(phase + f)
        out[i] = complex(np.cos(F32(phase)), np.sin(F32(phase)))
    phase = F32(phase - F32(np.floor(phase / (F32(2) * PI))) * F32(2) * PI)
    return ampl * out, phase


def modulate_f32(symbols, sf, osr, bw_scale, sync=0x12, ampl=1.0):
    """Sequential lora_modulate (LoRaMod.cpp:8-43) with float32 phases."""
    n = 1 << sf
    step = n * osr
    shift = sf - 4 if sf > 4 else 0
    sw0 = ((sync >> 4) << shift) & 0xFFFF
    sw1 = ((sync & 0x0F) << shift) & 0xFFFF
    phase = F32(0.0)
    chunks = []
    for s in [sw0, sw1] + list(symbols):
        f0 = F32((F32(2) * PI * F32(s) * F32(bw_scale)) / F32(n * osr))
        c, phase = gen_chirp_f32(n, osr, step, f0, False, ampl, phase,
                                 bw_scale)
        chunks.append(c)
    return np.concatenate(chunks)


def interleave_seq(codewords, ppm, rdd):
    """Direct per-bit diagonal interleaver (LoRaCodes.hpp:376-393 spec)."""
    cw = np.asarray(codewords, np.uint16)
    nb = 4 + rdd
    nblk = len(cw) // ppm
    out = np.zeros(nblk * nb, np.uint16)
    for blk in range(nblk):
        for bit in range(nb):
            sym = 0
            for c in range(ppm):
                src = (c + bit) % ppm
                b = (int(cw[blk * ppm + src]) >> bit) & 1
                sym |= b << c
            out[blk * nb + bit] = sym
    return out


def deinterleave_seq(symbols, ppm, rdd):
    """Direct per-bit diagonal deinterleaver (LoRaCodes.hpp:396-412 spec)."""
    sym = np.asarray(symbols, np.uint16)
    nb = 4 + rdd
    nblk = len(sym) // nb
    out = np.zeros(nblk * ppm, np.uint8)
    for blk in range(nblk):
        for bit in range(nb):
            s = int(sym[blk * nb + bit])
            for c in range(ppm):
                dst = (c + bit) % ppm
                out[blk * ppm + dst] |= (s & 1) << bit
                s >>= 1
    return out
