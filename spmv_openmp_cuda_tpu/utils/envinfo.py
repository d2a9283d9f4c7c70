"""Runtime environment introspection.

Analog of the reference's OMP ICV introspection (ompGetICV.c:23-73:
ompGetRuntimeSchedule / ompGetAllICV printed for logging) and the standalone
env-check programs (test/ompChecks/*.cpp): report the JAX backend, device
inventory, mesh capabilities, and the config env overrides in effect.
"""
from __future__ import annotations

import os
from typing import Dict, List


def env_overrides() -> Dict[str, str]:
    keys = [
        "GRID_ROWS", "GRID_COLS", "BLOCK_ROWS", "BLOCK_WIDTH",
        "PALLAS_BLOCK_N", "SPMV_DTYPE", "AVG_TIMES_ITERATION",
        "SPMV_SCHEDULE", "SPMV_ROWLENS", "SPMV_SIMD", "TMPDIR",
        "JAX_PLATFORMS", "XLA_FLAGS",
    ]
    return {k: os.environ[k] for k in keys if k in os.environ}


def runtime_info() -> Dict[str, object]:
    import jax

    devs = jax.devices()
    info: Dict[str, object] = {
        "jax_version": jax.__version__,
        "backend": jax.default_backend(),
        "device_count": len(devs),
        "devices": [str(d) for d in devs],
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "env_overrides": env_overrides(),
    }
    try:
        d = devs[0]
        info["device_kind"] = d.device_kind
        stats = d.memory_stats() or {}
        if "bytes_limit" in stats:
            info["hbm_bytes"] = stats["bytes_limit"]
    except Exception:
        pass
    return info


def format_info() -> str:
    info = runtime_info()
    lines: List[str] = [f"{k}: {v}" for k, v in info.items()]
    return "\n".join(lines)


if __name__ == "__main__":
    print(format_info())
