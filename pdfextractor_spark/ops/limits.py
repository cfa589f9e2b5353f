"""Decode-bomb guards for the multimodal decoders.

At 10^12-document scale the media column WILL contain adversarial
payloads: a 200-byte PNG/GIF/JPEG header can declare 100k x 100k pixels
and make a naive decoder allocate tens of GB. A Python ``MemoryError``
would surface as a per-row error, but a large allocation that *succeeds*
and then drives the executor into the kernel OOM killer is NOT catchable
— it kills the whole executor and fails tasks for every other row in the
batch. So every decoder checks the *declared* output size against a hard
ceiling BEFORE allocating, and oversized declarations become ordinary
per-row ``ValueError`` rows (PIL's ``MAX_IMAGE_PIXELS`` plays the same
role for the same reason).

The ceiling is per-image pixels (default 2^24 = 16.7M px — a 4096x4096
image; the JPEG decoder holds float64 coefficient planes, ~8 B/px/comp,
so with 32 concurrent tasks this bounds decode scratch to ~13 GB on a
128 GB executor), overridable with ``SPARK_GRAFT_MAX_PIXELS`` for
corpora with legitimate larger assets.
"""

from __future__ import annotations

import os

DEFAULT_MAX_PIXELS = 1 << 24


def max_pixels() -> int:
    return int(os.environ.get("SPARK_GRAFT_MAX_PIXELS", DEFAULT_MAX_PIXELS))


def check_pixels(width: int, height: int, what: str) -> None:
    """Reject non-positive or bomb-sized declared dimensions before any
    buffer proportional to them is allocated."""
    if width <= 0 or height <= 0:
        raise ValueError(f"{what}: invalid declared dimensions {width}x{height}")
    cap = max_pixels()
    if width * height > cap:
        raise ValueError(
            f"{what}: declared {width}x{height} = {width * height} px exceeds "
            f"the {cap} px decode ceiling (SPARK_GRAFT_MAX_PIXELS)")
