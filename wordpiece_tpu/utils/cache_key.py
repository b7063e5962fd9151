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

import hashlib
import os
import platform
import re


def machine_key() -> str:
    """Stable slug identifying this machine's CPU (model + arch + a hash
    of the feature-flag set).

    The flag hash matters: virtualized hosts often report a GENERIC model
    string (e.g. "Intel(R) Xeon(R) Processor @ 2.10GHz") while exposing
    different feature sets, so model name alone maps two incompatible
    machines to the same slug — exactly the AOT SIGILL hazard this key
    exists to prevent.  XLA:CPU compiles against the precise feature set,
    so the feature set is the correct cache-identity.
    """
    model = ""
    flags = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                low = line.lower()
                if not model and low.startswith("model name"):
                    model = line.split(":", 1)[1].strip()
                if not flags and low.startswith("flags"):
                    flags = line.split(":", 1)[1].strip()
                if model and flags:
                    break
    except OSError:
        pass
    if not model:
        model = platform.processor() or "unknown"
    fhash = hashlib.sha256(" ".join(sorted(flags.split())).encode()).hexdigest()[:10]
    slug = re.sub(r"[^A-Za-z0-9]+", "-", f"{platform.machine()}-{model}")
    return f"{slug.strip('-').lower()[:68]}-{fhash}"


def cache_dir(base: str) -> str:
    """Machine-keyed subdirectory of `base`, created if missing."""
    d = os.path.join(base, machine_key())
    os.makedirs(d, exist_ok=True)
    return d
