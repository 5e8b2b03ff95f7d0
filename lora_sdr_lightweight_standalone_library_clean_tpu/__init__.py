"""TPU-native LoRa PHY framework.

A from-scratch JAX/XLA re-design of the LoRa-SDR lightweight standalone
library (reference: yakir1991/LoRa-SDR-Lightweight-Standalone-Library-clean)
for TPU hardware: batched, jittable, mesh-shardable chirp-spread-spectrum
TX/RX with an MXU-native DFT core.
"""
import os as _os

if _os.environ.get("JAX_PLATFORMS"):
    # The container's sitecustomize force-registers its TPU platform and
    # ignores JAX_PLATFORMS; honor the env var so CLI subprocesses (and CI)
    # can pin the CPU backend without paying TPU-tunnel init per process.
    import jax as _jax

    _jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])

try:
    # Persistent compilation cache: TPU compiles of the larger kernels run
    # minutes through the tunnel; caching them on disk makes every
    # subsequent process (bench, CLI, tests) start warm.
    import jax as _jax

    _cache = _os.environ.get("JAX_COMPILATION_CACHE_DIR",
                             _os.path.expanduser("~/.cache/jax_lora_tpu"))
    _jax.config.update("jax_compilation_cache_dir", _cache)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:  # pragma: no cover - cache is best-effort
    pass

from .utils.config import LoraParams, Window, load_profiles, params_from_profile, STOCK_PROFILES
from .utils import errors
from .models.modem import (
    encode, decode, modulate, modulate_dechirped, demodulate, demodulate_wide,
    estimate_offsets,
    compensate_offsets, dechirp, to_complex, from_complex, crc_sx1272,
    DemodResult, OffsetEstimate,
)
from .models.tones import demodulate_tones
from .models import lorawan, sweep
from .models.frame import (
    encode_frame, decode_frame, decode_frame_padded, decode_header,
    frame_symbols, max_frame_symbols, FrameHeader, FrameResult,
)
from .ops import channel
from .parallel import mesh, streaming
from .parallel.receiver import (
    receive_stream, receive_stream_frames, stream_rx_init,
    stream_frames_init, packet_samples, StreamRxState,
    RecoveredPackets, RecoveredFrames,
)

__version__ = "0.1.0"
