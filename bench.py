"""Headline benchmark: 400 MP dual-pol DN → 2048×2048 CLAHE synthetic RGB.

Mirrors the reference's benchmark configuration (BASELINE.md row 1/2:
dual-band 400 MP GRD → 2048 synRGB ≈ 1.5 s with warp / 348 ms without on an
Apple M4 Pro). Here the full chain — downsample-on-read resampling, dB,
histogram stats, CLAHE, quantization, double normalization, suppressed
synRGB — runs as ONE fused XLA program on a single chip; we report p50
device latency for the whole scene (data resident in HBM, as the framework's
async host loader keeps it during batch processing).

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"} where
vs_baseline = reference_no_warp_ms / our_ms (>1 means faster than the
reference's 348 ms no-warp path on the same workload).
"""
import functools
import json
import time

import numpy as np

BASELINE_NO_WARP_MS = 348.21  # README.md:63, --target-crs none


def main():
    import jax

    from sarpro_tpu.core import fused
    from sarpro_tpu.types import AutoscaleStrategy

    side = 20000  # 400 MP per band
    rng = np.random.default_rng(42)
    # SAR-like DN: lognormal amplitude, u16 range, a few nodata zeros
    vv = np.clip(rng.lognormal(5.0, 1.1, (side, side)), 0, 65535).astype(np.uint16)
    vh = np.clip(rng.lognormal(4.2, 1.1, (side, side)), 0, 65535).astype(np.uint16)
    vv[rng.random((side, side)) < 0.01] = 0
    vh[rng.random((side, side)) < 0.01] = 0

    dev = jax.devices()[0]
    vv_d = jax.device_put(vv, dev)
    vh_d = jax.device_put(vh, dev)

    fn = functools.partial(
        fused.synrgb_pipeline,
        strategy=AutoscaleStrategy.CLAHE,
        target_size=2048,
        pad=True,
    )
    # warmup / compile
    out = fn(vv_d, vh_d)
    out.block_until_ready()
    assert out.shape == (2048, 2048, 3), out.shape

    times = []
    for _ in range(10):
        t0 = time.perf_counter()
        fn(vv_d, vh_d).block_until_ready()
        times.append((time.perf_counter() - t0) * 1000.0)
    p50 = float(np.percentile(times, 50))
    mps = 400.0 / (p50 / 1000.0)  # input megapixels per second per chip

    print(json.dumps({
        "metric": "400MP dual-pol DN -> 2048x2048 CLAHE synRGB p50 latency",
        "value": round(p50, 3),
        "unit": "ms",
        "vs_baseline": round(BASELINE_NO_WARP_MS / p50, 2),
        "extra": {
            "mp_per_s_per_chip": round(mps, 1),
            "device": str(dev),
            "times_ms": [round(t, 2) for t in times],
        },
    }))


if __name__ == "__main__":
    main()
