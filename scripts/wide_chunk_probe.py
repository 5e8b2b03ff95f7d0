#!/usr/bin/env python3
"""On-chip probe: which symbol-chunk sizes fit VMEM for the 16384-bin
wide detection, and what each costs.

The chunked wide receiver (models/modem.py::demodulate_wide) pays a
2-row halo per chunk; at the r4 model's chunk = 6 that is 25% of the
slab DMA re-read per chunk (VERDICT r4 weak #3 / next #6).  Raising the
chunk amortizes the halo, but the VMEM model (ops/pallas_rx.py::_vmem_ok)
was calibrated against the r4 all-roll DIF kernel.  This probe bypasses
the model, launching the kernel at increasing chunk sizes directly; a
Mosaic scoped-vmem error marks the true ceiling, and per-symbol timing
shows the halo amortization.  Results recalibrate _vmem_ok.

Usage: python scripts/wide_chunk_probe.py [chunks ...]  (default 6..40)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

import lora_sdr_lightweight_standalone_library_clean_tpu as L
from lora_sdr_lightweight_standalone_library_clean_tpu.ops.pallas_rx \
    import rx_window_detect


def slope(loop, args, iters_short=4, target=1.5, cap=4096, reps=3):
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


def probe(chunk: int, batch: int = 16):
    """Time one chunked call shape: chunk detected rows + 2 halo rows."""
    params = L.LoraParams(sf=12, bw=500000, osr=4)
    step = params.step
    s_real = chunk + 2
    rng = np.random.default_rng(0)
    sr = jnp.asarray(rng.standard_normal((batch, s_real * step))
                     .astype(np.float32))
    si = jnp.asarray(rng.standard_normal((batch, s_real * step))
                     .astype(np.float32))
    t_off = jnp.asarray(rng.integers(-step // 2, step // 2, batch)
                        .astype(np.int32))
    rate = jnp.full((batch,), 1e-4, jnp.float32)
    scale = jnp.ones((batch,), jnp.float32)
    mr = jnp.asarray(rng.standard_normal(step).astype(np.float32))
    mi = jnp.zeros(step, jnp.float32)

    @jax.jit
    def loop(r, i, iters):
        def body(_, acc):
            eps = acc.astype(jnp.float32) * 1e-30
            idx, _, _ = rx_window_detect(r + eps, i + eps, t_off, rate,
                                         scale, mr, mi, params, wide=True,
                                         halo=(1, 1))
            return acc + jnp.sum(idx)
        return lax.fori_loop(0, iters, body, jnp.int32(0))

    dt = slope(loop, (sr, si))
    return dt / (batch * chunk) * 1e9      # ns per DETECTED symbol


def main():
    chunks = [int(a) for a in sys.argv[1:]] or [6, 8, 12, 16, 24, 32, 40]
    for c in chunks:
        try:
            ns = probe(c)
            print(f"chunk={c:3d} (s_real {c + 2:3d}): {ns:,.0f} ns/sym "
                  f"(halo overhead {2 / (c + 2) * 100:.0f}% of slab)")
        except Exception as e:
            msg = str(e).splitlines()[0][:120] if str(e) else type(e).__name__
            print(f"chunk={c:3d}: FAILED {type(e).__name__}: {msg}")


if __name__ == "__main__":
    main()
