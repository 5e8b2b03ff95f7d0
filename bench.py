#!/usr/bin/env python3
"""Benchmark: packets/s through the reference perf pipeline, on TPU.

Mirrors tests/performance_test.cpp:112-125 — per packet: modulate +
dechirp multiply + tones-path demodulate (sf7_bw125_cr45, 32-byte payload,
64 data + 2 sync symbols) — but batched over thousands of packets so the
MXU does the work.  Prints ONE JSON line:

    {"metric": "packets_per_sec_sf7", "value": N, "unit": "pps",
     "vs_baseline": N / 4036.5}

Baseline: 4036.5 pps, the reference binary measured on the container's CPU
(BASELINE.md).  Extra per-profile rows go to stderr; a CSV compatible with
scripts/compare_perf.py is written to logs/performance_<RUN_ID>.csv.
"""
import json
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import lora_sdr_lightweight_standalone_library_clean_tpu as L

BASELINE_PPS = {
    "sf7_bw125_cr45": 4036.5,
    "sf7_bw125_cr47": 3879.9,
    "sf8_bw125_cr45": 2245.2,
    "sf9_bw250_cr48": 1007.4,
    "sf10_bw250_cr47": 496.5,
    "sf11_bw500_cr45": 231.4,
    "sf12_bw500_cr45": 121.0,
}

PAYLOAD_SIZE = 32


def make_step(params: L.LoraParams):
    """The timed pipeline: modulate + dechirp + demodulate (batched).
    Returns a tiny checksum so the host fetch that forces completion moves
    four bytes, not the IQ."""

    @jax.jit
    def step(symbols):
        re, im = L.modulate(symbols, params)
        dr, di = L.dechirp(re, im, params)
        res = L.demodulate_tones(dr, di, params)
        return jnp.sum(res.symbols.astype(jnp.int32))

    return step


def bench_profile(profile: dict, batch: int, iters: int = 6) -> float:
    """Time iters fetched pipeline calls.  The device tunnel costs ~30 ms
    per fetch; the batch is sized so each call does >= 10x that in compute,
    and the residual overhead under-reports (never inflates) throughput."""
    params = L.params_from_profile(profile)
    payloads = np.tile(np.arange(PAYLOAD_SIZE, dtype=np.uint8),
                       (batch, 1))
    symbols = jnp.asarray(np.asarray(L.encode(payloads)))
    step = make_step(params)
    np.asarray(step(symbols))  # compile + run + fetch (warmup)
    t0 = time.perf_counter()
    for _ in range(iters):
        np.asarray(step(symbols))  # fetch forces completion
    dt = (time.perf_counter() - t0) / iters
    return batch / dt


def main():
    run_id = os.environ.get("RUN_ID", "run")
    # batch sized so each profile's IQ working set stays comfortable in HBM
    batches = {7: 8192, 8: 4096, 9: 2048, 10: 1024, 11: 512, 12: 256}
    results = {}
    for profile in L.STOCK_PROFILES:
        name = profile["name"]
        try:
            pps = bench_profile(profile, batches[profile["sf"]])
        except Exception as e:  # keep the headline metric alive
            print(f"{name}: FAILED {type(e).__name__}: {e}", file=sys.stderr)
            continue
        results[name] = pps
        print(f"{name}: {pps:,.0f} pps ({pps / BASELINE_PPS[name]:,.1f}x "
              f"baseline)", file=sys.stderr)

    os.makedirs("logs", exist_ok=True)
    with open(f"logs/performance_{run_id}.csv", "w") as f:
        f.write("run_id,profile,sf,N,pps,cycles_per_symbol\n")
        for profile in L.STOCK_PROFILES:
            name = profile["name"]
            if name in results:
                f.write(f"{run_id},{name},{profile['sf']},"
                        f"{1 << profile['sf']},{results[name]:.1f},0\n")

    headline = results.get("sf7_bw125_cr45", 0.0)
    print(json.dumps({
        "metric": "packets_per_sec_sf7",
        "value": round(headline, 1),
        "unit": "pps",
        "vs_baseline": round(headline / BASELINE_PPS["sf7_bw125_cr45"], 2),
    }))


if __name__ == "__main__":
    main()
