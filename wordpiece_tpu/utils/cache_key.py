"""Per-machine XLA compile-cache keying.

The persistent compilation cache stores AOT results whose validity
depends on the machine that compiled them: XLA:CPU compiles for the
host's exact CPU (an entry built on one machine type can SIGILL on
another), and different backends (axon TPU tunnel vs cpu) must never
share a directory either.  Keying the cache directory by a slug of the
CPU model + architecture keeps every (machine, backend-independent)
population separate without initializing the JAX backend at import time
(the XLA cache key itself already distinguishes platforms; the machine
type is what it misses).
"""

from __future__ import annotations

import os
import platform
import re


def machine_key() -> str:
    """Stable slug identifying this machine's CPU (model + arch)."""
    model = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.lower().startswith("model name"):
                    model = line.split(":", 1)[1].strip()
                    break
    except OSError:
        pass
    if not model:
        model = platform.processor() or "unknown"
    slug = re.sub(r"[^A-Za-z0-9]+", "-", f"{platform.machine()}-{model}")
    return slug.strip("-").lower()[:80]


def cache_dir(base: str) -> str:
    """Machine-keyed subdirectory of `base`, created if missing."""
    d = os.path.join(base, machine_key())
    os.makedirs(d, exist_ok=True)
    return d
