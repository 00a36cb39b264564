"""Tests: tiled warp kernel planning (host) + TPU parity (skipped off-TPU)."""
import jax
import numpy as np
import pytest

from sarpro_tpu.ops import warp_kernel as wk


def _mapping(side, out, rot=0.02):
    gh = gw = 65
    yy, xx = np.meshgrid(np.linspace(0, 1, gh), np.linspace(0, 1, gw),
                         indexing="ij")
    map_x = (xx * 0.95 + rot * yy) * (side - 8) + 3.0
    map_y = (yy * 0.94 + rot * xx) * (side - 8) + 2.0
    return map_x, map_y


def test_plan_produces_aligned_windows():
    side, out = 2600, 2048
    map_x, map_y = _mapping(side, out)
    plan = wk.plan_tiled_warp(map_x, map_y, side, side, out, out, "cubic")
    assert plan is not None
    oy, ox, cx, cy, nty, ntx = plan
    assert nty == -(-out // wk.TR) and ntx == -(-out // wk.TC)
    assert oy.size == nty * ntx
    assert (oy % 8 == 0).all() and (ox % 128 == 0).all()
    assert (oy >= 0).all() and (ox >= 0).all()
    assert cx.shape == (nty * ntx, 4) and cx.dtype == np.float32


def test_plan_rejects_oversized_scale():
    """Local scale beyond the window budget -> fall back to XLA."""
    side, out = 4000, 256  # scale ~15 per output pixel
    map_x, map_y = _mapping(side, out)
    assert wk.plan_tiled_warp(map_x, map_y, side, side, out, out,
                              "bilinear") is None


def test_plan_rejects_tiny_source():
    map_x, map_y = _mapping(100, 64)
    assert wk.plan_tiled_warp(map_x, map_y, 100, 100, 64, 64, "near") is None


def test_plan_coefficients_reproduce_corner_mapping():
    """The per-tile bilinear coefficients must reproduce the corner lattice."""
    side, out = 2600, 2048
    map_x, map_y = _mapping(side, out)
    plan = wk.plan_tiled_warp(map_x, map_y, side, side, out, out, "bilinear")
    oy, ox, cx, cy, nty, ntx = plan
    # check tile (1, 2)'s corner
    t = 1 * ntx + 2
    r0, c0 = 1 * wk.TR, 2 * wk.TC
    a, b, c, d = cx[t]
    sx = a + b * c0 + c * r0 + d * r0 * c0
    # expected from the grid interp
    gh = 65
    gr = r0 * ((gh - 1) / (out - 1))
    gc = c0 * ((gh - 1) / (out - 1))
    i0, j0 = int(gr), int(gc)
    fr, fc = gr - i0, gc - j0
    want = (map_x[i0, j0] * (1 - fr) * (1 - fc) + map_x[i0, j0 + 1] * (1 - fr) * fc
            + map_x[i0 + 1, j0] * fr * (1 - fc) + map_x[i0 + 1, j0 + 1] * fr * fc)
    assert sx == pytest.approx(want, abs=0.01)


@pytest.mark.skipif(jax.default_backend() != "tpu", reason="needs TPU")
def test_tiled_warp_parity_on_tpu(rng):
    import jax.numpy as jnp

    from sarpro_tpu.io import warp as W

    side, out = 2600, 2048
    map_x, map_y = _mapping(side, out)
    src = jnp.asarray(rng.normal(size=(side, side)).astype(np.float32))
    for method in ("bilinear", "cubic"):
        got = wk.warp_sample_tiled(src, map_x, map_y, out, out, method)
        assert got is not None
        ref = np.asarray(W._warp_sample(
            src, jnp.asarray(map_x, jnp.float32),
            jnp.asarray(map_y, jnp.float32), out, out, method))
        d = np.abs(np.asarray(got) - ref)
        assert d.mean() < 1e-3
