"""Static-shape bucketing.

XLA compiles one executable per input shape, so every variable-length
input (streaming chunk, training sequence, vision patch run) pads up to
the smallest configured bucket that fits — a handful of executables
instead of one per length (the reference has no equivalent: torch runs
dynamic shapes; on TPU they would recompile every step)."""

from __future__ import annotations

from typing import Sequence

__all__ = ["bucket_for"]


def bucket_for(n: int, buckets: Sequence[int], *, what: str = "sequence",
               fix: str = "") -> int:
    """Smallest bucket >= n. Raises ValueError naming the overflow and the
    configured buckets; `fix` appends a caller-specific remedy."""
    for b in buckets:
        if n <= b:
            return b
    raise ValueError(
        f"{what} of {n} tokens exceeds the largest bucket {buckets[-1]} "
        f"(buckets={tuple(buckets)}).{fix}"
    )
