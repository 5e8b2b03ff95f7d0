#!/usr/bin/env python3
"""On-chip tuner for the hybrid-DFT DIF pass crossover (_SLICE_MAXB).

The fused RX kernel's hybrid DFT (ops/pallas_rx.py::_dft_mag_argmax) has
two bit-identical per-pass forms — per-block static slices vs full-width
roll+select — gated by ``_SLICE_MAXB`` (max block count that still uses
the slice form).  The knob is read at trace time, so each candidate runs
in a subprocess with LORA_DIF_SLICE_MAXB set; the child times the fused
kernel in isolation (device-looped, two-point slope) at every hybrid
size the receiver uses: n = 1024/2048/4096 (sf10-12 packet path) and
16384 (the sf12-wide full-rate detection).

Usage:  python scripts/dif_tune.py [maxb ...]    (default: 0 4 8 16 32 64)
``maxb=0`` reproduces the pre-r5 all-roll behaviour (the baseline).
"""
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, sys, time
sys.path.insert(0, %r)
import numpy as np, jax, jax.numpy as jnp
from jax import lax
import lora_sdr_lightweight_standalone_library_clean_tpu as L
from lora_sdr_lightweight_standalone_library_clean_tpu.ops.pallas_rx \
    import rx_window_detect

def slope(loop, args, iters_short=4, target=2.0, cap=4096, reps=3):
    # best-of-reps two-point slopes: the tunnel adds tens of ms of
    # per-dispatch jitter, so a single slope is unreliable
    int(loop(*args, iters_short))
    t0 = time.perf_counter()
    int(loop(*args, iters_short))
    ws = time.perf_counter() - t0
    iters = int(min(cap, max(iters_short * 2,
                             iters_short * target / max(ws, 1e-6))))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        int(loop(*args, iters_short))
        ws = time.perf_counter() - t0
        t0 = time.perf_counter()
        int(loop(*args, iters))
        wl = time.perf_counter() - t0
        best = min(best, (wl - ws) / (iters - iters_short))
    return best

def time_case(params, batch, syms, wide):
    n, osr, step = params.n, params.osr, params.step
    ndft = step if wide else n
    rng = np.random.default_rng(0)
    sr = jnp.asarray(rng.standard_normal((batch, syms * step))
                     .astype(np.float32))
    si = jnp.asarray(rng.standard_normal((batch, syms * step))
                     .astype(np.float32))
    t_off = jnp.asarray(rng.integers(-step // 2, step // 2, batch)
                        .astype(np.int32))
    rate = jnp.full((batch,), 1e-4, jnp.float32)
    scale = jnp.ones((batch,), jnp.float32)
    mr = jnp.asarray(rng.standard_normal(ndft).astype(np.float32))
    mi = jnp.asarray(rng.standard_normal(ndft).astype(np.float32))

    @jax.jit
    def loop(r, i, iters):
        def body(_, acc):
            eps = acc.astype(jnp.float32) * 1e-30
            idx, pw, pav = rx_window_detect(r + eps, i + eps, t_off, rate,
                                            scale, mr, mi, params, wide=wide)
            return acc + jnp.sum(idx)
        return lax.fori_loop(0, iters, body, jnp.int32(0))

    dt = slope(loop, (sr, si))
    return dt / (batch * syms) * 1e9          # ns per detected symbol

cases = [
    ("n1024",  L.LoraParams(sf=10, bw=250000), 512, 16, False),
    ("n2048",  L.LoraParams(sf=11, bw=500000), 256, 16, False),
    ("n4096",  L.LoraParams(sf=12, bw=500000), 128, 16, False),
    ("n16384w", L.LoraParams(sf=12, bw=500000, osr=4), 32, 6, True),
]
out = {}
for name, p, batch, syms, wide in cases:
    out[name] = time_case(p, batch, syms, wide)
print("RESULT " + json.dumps(out))
"""


def main():
    cands = [int(a) for a in sys.argv[1:]] or [0, 4, 8, 16, 32, 64]
    rows = {}
    for maxb in cands:
        env = dict(os.environ, LORA_DIF_SLICE_MAXB=str(maxb))
        r = subprocess.run([sys.executable, "-c", CHILD % REPO], env=env,
                           capture_output=True, text=True, timeout=1200)
        line = [ln for ln in r.stdout.splitlines()
                if ln.startswith("RESULT ")]
        if not line:
            print(f"maxb={maxb}: FAILED\n{r.stderr[-2000:]}",
                  file=sys.stderr)
            continue
        rows[maxb] = json.loads(line[0][7:])
        print(f"maxb={maxb}: " + " | ".join(
            f"{k} {v:,.0f} ns/sym" for k, v in rows[maxb].items()))
    if rows:
        best = {}
        for k in next(iter(rows.values())):
            best[k] = min(rows, key=lambda m: rows[m][k])
        print("best maxb per size:", best)


if __name__ == "__main__":
    main()
