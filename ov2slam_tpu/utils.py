"""Small host-side utilities."""

from __future__ import annotations

import os
from typing import List

import numpy as np
import jax


def enable_compilation_cache(path: str = "/tmp/ov2slam_tpu_jaxcache"):
    """Persist XLA compilations across processes (first-compile on the
    tunneled TPU costs tens of seconds; the cache removes it entirely)."""
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def fetch_np(*arrays) -> List[np.ndarray]:
    """Fetch several device arrays with overlapped transfers.

    Each blocking device->host read costs a full link round trip (~30 ms on
    the tunneled TPU); starting async copies first makes N fetches cost ~1."""
    for a in arrays:
        try:
            a.copy_to_host_async()
        except AttributeError:
            pass
    # np.array (not asarray): callers mutate these host copies
    return [np.array(a) for a in arrays]
