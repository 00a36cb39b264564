"""Persistent XLA compilation cache for cold-start latency.

The fused pipelines compile in ~5-40 s per (shape, strategy) configuration;
the streamed big-scene path compiles one program per (chunk-shape, pass).
A persistent cache makes every program after the first process a disk hit —
the difference between a ~5 min and a ~10 s cold CLI run on huge scenes.

Enabled by the CLI/GUI entry points; library users call
`enable_compilation_cache()` themselves (a global jax.config mutation is
not something a library should do on import). `SARPRO_JAX_CACHE=off`
disables; any other value overrides the directory.
"""
from __future__ import annotations

import logging
import os

logger = logging.getLogger("sarpro")

_DEFAULT = "~/.cache/sarpro_tpu/jax"


def enable_compilation_cache(path: str | None = None) -> str | None:
    env = os.environ.get("SARPRO_JAX_CACHE")
    if env == "off":
        return None
    target = os.path.expanduser(path or env or _DEFAULT)
    try:
        os.makedirs(target, exist_ok=True)
        import jax

        jax.config.update("jax_compilation_cache_dir", target)
        # cache even quick compiles: the streamed path dispatches dozens of
        # small per-chunk programs whose compile times sit near the default
        # 1 s threshold
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)
    except Exception as e:  # noqa: BLE001 — cache is an optimization only
        logger.warning("compilation cache unavailable: %s", e)
        return None
    return target
