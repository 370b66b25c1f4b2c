"""Device-memory accounting (reference MemoryTrack ctx manager,
utils/public_function.py:873-931, and free-memory-aware auto batch
`get_nbatch` :162-261)."""

from __future__ import annotations

from contextlib import contextmanager

import jax

__all__ = ["device_memory_stats", "MemoryTrack", "auto_eloc_batch"]


def device_memory_stats(device=None) -> dict:
    d = device or jax.devices()[0]
    stats = getattr(d, "memory_stats", lambda: None)()
    return stats or {}


@contextmanager
def MemoryTrack(tag: str = "", logger=None, device=None):
    """Log bytes-in-use delta and peak around a block."""
    before = device_memory_stats(device)
    yield
    after = device_memory_stats(device)
    if after:
        used = after.get("bytes_in_use", 0) - before.get("bytes_in_use", 0)
        peak = after.get("peak_bytes_in_use", 0)
        msg = f"[mem:{tag}] Δ={used / 2**20:.1f} MiB peak={peak / 2**20:.1f} MiB"
        (logger.info if logger else print)(msg)


def auto_eloc_batch(
    n_samples: int,
    n_sd: int,
    sorb: int,
    bytes_per_elem: int = 4,
    budget_bytes: int | None = None,
    device=None,
) -> int:
    """Largest power-of-two eloc chunk whose connected-space buffers
    ([chunk, 1+n_sd, sorb] bits + Hij + ψ pairs) fit in the budget
    (defaults to 60% of free HBM when stats are available, else 4 GiB).
    """
    if budget_bytes is None:
        stats = device_memory_stats(device)
        limit = stats.get("bytes_limit")
        used = stats.get("bytes_in_use", 0)
        budget_bytes = (
            int(0.6 * (limit - used)) if limit else 4 << 30
        )
    per_sample = (1 + n_sd) * (sorb + 3 * bytes_per_elem + 2 * bytes_per_elem)
    chunk = max(1, budget_bytes // max(per_sample, 1))
    chunk = 1 << (int(chunk).bit_length() - 1)
    return int(min(chunk, n_samples))
