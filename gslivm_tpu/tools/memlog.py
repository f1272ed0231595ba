"""Per-frame device-memory logging (python/listen_odom.py parity: the
reference samples nvidia-smi per odometry message; here we read the XLA
device allocator stats).

Produces the `stamp,mb` CSV consumed by tools.time_plot --mem-log.
"""

from __future__ import annotations

import time


def device_memory_mb(device=None) -> float:
    """Bytes in use on the accelerator, in MB; 0.0 when the backend does
    not expose allocator stats (CPU)."""
    import jax

    dev = device or jax.local_devices()[0]
    stats = getattr(dev, "memory_stats", lambda: None)()
    if not stats:
        return 0.0
    return stats.get("bytes_in_use", 0) / 1e6


class MemoryLogger:
    """Append-mode `stamp,mb` sampler; call sample() once per frame."""

    def __init__(self, path: str, device=None):
        self.path = path
        self.device = device
        open(path, "w").close()

    def sample(self, stamp: float | None = None) -> float:
        mb = device_memory_mb(self.device)
        with open(self.path, "a") as f:
            f.write(f"{time.time() if stamp is None else stamp:.6f},"
                    f"{mb:.3f}\n")
        return mb
