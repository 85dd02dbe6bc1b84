"""Misc helpers — parity with `utils/utils.py`."""

from __future__ import annotations

import datetime
import math
import os
from typing import Optional

import numpy as np


def enable_persistent_compilation_cache(
        path: Optional[str] = None) -> None:
    """Cache XLA/Mosaic compilations on disk across processes.

    Cold compiles through the remote-TPU tunnel cost minutes (the Pallas
    median kernel alone ~160s); with the persistent cache, repeat runs of
    the CLI / bench / eval pipeline skip them entirely.
    """
    import jax

    path = path or os.path.join(
        os.path.expanduser("~"), ".cache", "uadmri_jax")
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax or read-only fs: run without the cache


def device_peaks(dev_kind: str) -> tuple:
    """(peak_dense_flops_per_sec, peak_hbm_bytes_per_sec) for a TPU
    ``device_kind`` string — the single source for the MFU rows in
    ``bench.py`` and the ceilings in ``tools/parity_stage_roofline.py``
    (they must quote the same peaks or the published numbers diverge).
    Unknown kinds (CPU smoke runs) get placeholder ceilings so output
    keeps its shape without implying a real utilisation number."""
    kind = dev_kind.lower()
    if "v5" in kind or "lite" in kind:
        return 197e12, 819e9  # v5e bf16 dense / HBM
    if "v4" in kind:
        return 275e12, 1228e9
    return 1e12, 100e9


def timestamp() -> str:
    """(`utils/utils.py` timestamp)."""
    return datetime.datetime.now().strftime("%Y%m%d-%H%M%S")


def normalize(x: np.ndarray) -> np.ndarray:
    """Min-max normalise to [0, 1] (`utils/utils.py:74-75`)."""
    x = np.asarray(x, np.float32)
    lo, hi = x.min(), x.max()
    if hi > lo:
        return (x - lo) / (hi - lo)
    return np.zeros_like(x)


def apply_colormap(img: np.ndarray, cmap=None) -> np.ndarray:
    """Apply a matplotlib colormap to a [0,1] image -> uint8 RGB."""
    if cmap is None:
        import matplotlib.pyplot as plt

        cmap = plt.cm.jet
    rgba = cmap(normalize(np.squeeze(img)))
    return (rgba[..., :3] * 255).astype(np.uint8)


def json_sanitize(obj):
    """Replace non-finite floats with None, recursively.

    ``json.dumps`` emits bare ``NaN``/``Infinity`` — invalid RFC-8259 JSON
    that strict consumers (jq, JS) reject; ``None`` carries the same
    "missing/bad" signal.  Used by every JSON artifact writer (evalPC.json,
    infer reports, metrics JSONL).
    """
    if isinstance(obj, float) and not math.isfinite(obj):
        return None
    if isinstance(obj, dict):
        return {k: json_sanitize(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [json_sanitize(v) for v in obj]
    return obj
