"""Sharded pipelines: scene-batched, row-sharded processing over a Mesh.

Design (SURVEY.md §2.5 "TPU-native equivalents"):
  * a batch of same-shaped scenes is laid out (scene, rows, cols) and sharded
    P('scene', 'row', None): scenes spread across the 'scene' axis, each
    scene's rows split across the 'row' axis;
  * the fused pipeline (core/fused.py) is vmapped over the scene axis and
    jitted with those shardings — GSPMD turns the histogram scatter-adds into
    per-shard partials + psum over ICI, the min/max/count reductions into
    all-reduces, and keeps every elementwise stage fully local;
  * CLAHE's tile CDFs are computed from the (all-reduced) global tile
    histograms, so the bilinear-apply pass needs no halo exchange at all.

Scenes of different shapes are bucketed by the host driver (batch.py) before
entering here — XLA requires static shapes, so one compiled program serves
each bucket.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core import fused
from ..types import AutoscaleStrategy, BitDepth

SCENE_SPEC = P("scene", "row", None)
RGB_OUT_SPEC = P("scene", "row", None, None)


def shard_scene_batch(batch, mesh: Mesh):
    """Place a (scenes, rows, cols) array with scene+row sharding."""
    return jax.device_put(batch, NamedSharding(mesh, SCENE_SPEC))


@functools.partial(
    jax.jit,
    static_argnames=("strategy", "target_size", "pad", "mesh"),
)
def _synrgb_batch_jit(vv, vh, strategy, target_size, pad, mesh):
    fn = functools.partial(
        fused.synrgb_pipeline,
        strategy=strategy, target_size=target_size, pad=pad,
    )
    out = jax.vmap(fn)(vv, vh)
    return jax.lax.with_sharding_constraint(
        out, NamedSharding(mesh, RGB_OUT_SPEC)
    )


def synrgb_batch(
    vv_batch,
    vh_batch,
    mesh: Mesh,
    strategy: AutoscaleStrategy = AutoscaleStrategy.CLAHE,
    target_size: Optional[int] = 2048,
    pad: bool = False,
):
    """Process a batch of dual-pol scenes to synRGB across the mesh."""
    from ..ops.kernels import force_xla_fallbacks

    vv = shard_scene_batch(jnp.asarray(vv_batch), mesh)
    vh = shard_scene_batch(jnp.asarray(vh_batch), mesh)
    # Pallas custom calls are not GSPMD-partitionable: trace with the XLA
    # fallbacks so histograms lower to shardable scatters + psum
    with mesh, force_xla_fallbacks():
        return _synrgb_batch_jit(vv, vh, strategy, target_size, pad, mesh)


@functools.partial(
    jax.jit,
    static_argnames=("strategy", "bit_depth", "target_size", "pad", "mesh"),
)
def _gray_batch_jit(dn, strategy, bit_depth, target_size, pad, mesh):
    fn = functools.partial(
        fused.grayscale_pipeline,
        strategy=strategy, bit_depth=bit_depth,
        target_size=target_size, pad=pad,
    )
    out = jax.vmap(fn)(dn)
    return jax.lax.with_sharding_constraint(
        out, NamedSharding(mesh, P("scene", "row", None))
    )


def grayscale_batch(
    dn_batch,
    mesh: Mesh,
    strategy: AutoscaleStrategy = AutoscaleStrategy.STANDARD,
    bit_depth: BitDepth = BitDepth.U8,
    target_size: Optional[int] = None,
    pad: bool = False,
):
    """Process a batch of single-pol scenes across the mesh."""
    from ..ops.kernels import force_xla_fallbacks

    dn = shard_scene_batch(jnp.asarray(dn_batch), mesh)
    with mesh, force_xla_fallbacks():
        return _gray_batch_jit(dn, strategy, bit_depth, target_size, pad, mesh)
