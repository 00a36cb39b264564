"""Rounding/cast helpers matching the reference's Rust numerics.

Rust `.round()` rounds half *away from zero* while `jnp.round`/`np.round`
round half to even; Rust float->int `as` casts *truncate* toward zero and
saturate. Every quantization site in the reference uses one of these, so we
centralize the faithful equivalents here.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def round_half_away(x):
    """Round half away from zero (valid for any sign). jnp or np arrays."""
    if isinstance(x, np.ndarray) or np.isscalar(x):
        return np.trunc(x + np.copysign(0.5, x))
    return jnp.trunc(x + jnp.copysign(0.5, x))


def round_half_up_nonneg(x):
    """floor(x + 0.5): equals Rust .round() for x >= 0 (the common case)."""
    if isinstance(x, np.ndarray) or np.isscalar(x):
        return np.floor(x + 0.5)
    return jnp.floor(x + 0.5)


def trunc_sat_u16(x):
    """Rust `as u16` from float: truncate toward zero, saturate to [0, 65535],
    NaN -> 0. Callers clamp beforehand; we clamp again for safety."""
    x = jnp.nan_to_num(x, nan=0.0)
    return jnp.clip(jnp.trunc(x), 0.0, 65535.0).astype(jnp.uint16)


def trunc_sat_u8(x):
    """Rust `as u8` from float."""
    x = jnp.nan_to_num(x, nan=0.0)
    return jnp.clip(jnp.trunc(x), 0.0, 255.0).astype(jnp.uint8)
