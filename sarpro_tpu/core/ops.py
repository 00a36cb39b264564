"""Element-wise dual-polarization operations on linear intensities
(reference: src/core/processing/ops.rs:4-44).

All run as single fused XLA elementwise programs in f32.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

ZERO_GUARD = 1e-10  # |denominator| threshold (reference: ops.rs:16,29,41)


@jax.jit
def sum_arrays(a, b):
    """a + b (reference: ops.rs:4)."""
    return jnp.asarray(a, jnp.float32) + jnp.asarray(b, jnp.float32)


@jax.jit
def difference_arrays(a, b):
    """a - b (reference: ops.rs:7)."""
    return jnp.asarray(a, jnp.float32) - jnp.asarray(b, jnp.float32)


@jax.jit
def ratio_arrays(a, b):
    """a / b, 0 where |b| <= 1e-10 (reference: ops.rs:10-19)."""
    a = jnp.asarray(a, jnp.float32)
    b = jnp.asarray(b, jnp.float32)
    safe = jnp.abs(b) > ZERO_GUARD
    return jnp.where(safe, a / jnp.where(safe, b, 1.0), 0.0)


@jax.jit
def normalized_diff_arrays(a, b):
    """(a - b) / (a + b), 0 where |a+b| <= 1e-10 (reference: ops.rs:22-32)."""
    a = jnp.asarray(a, jnp.float32)
    b = jnp.asarray(b, jnp.float32)
    denom = a + b
    safe = jnp.abs(denom) > ZERO_GUARD
    return jnp.where(safe, (a - b) / jnp.where(safe, denom, 1.0), 0.0)


def log_ratio_arrays(a, b):
    """Log-ratio proxy == plain ratio; dB conversion happens downstream.
    Deliberately preserved quirk (reference: ops.rs:34-44)."""
    return ratio_arrays(a, b)


OPERATIONS = {
    "sum": sum_arrays,
    "diff": difference_arrays,
    "ratio": ratio_arrays,
    "n-diff": normalized_diff_arrays,
    "log-ratio": log_ratio_arrays,
}
