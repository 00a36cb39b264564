"""Headline benchmark: 400 MP dual-pol GRD → 2048×2048 CLAHE synthetic RGB.

Reference baseline (BASELINE.md row 2): the same scene end-to-end from disk
in ~348.21 ms on a 12-core Apple M4 Pro (`--target-crs none`). Two numbers
are reported here:

  * **e2e**: the real file pipeline (`api.process_safe_to_path(fast=True)`,
    the CLI `--fast` route) from a full-size synthetic SAFE on local disk
    (2× 20000×20000 u16 striped TIFFs) to the written JPEG — read, host
    box-reduce, host→device, fused device program, device→host, JPEG encode.
  * **device-resident**: the fused program alone with full-res DN already in
    HBM — the per-chip compute capability (what batch throughput is built
    from, since the async loader keeps the device fed).

Environment asymmetries, measured and documented in `extra` rather than
hidden: this host has ONE CPU core (reference machine: 12) and the TPU sits
behind a remote RPC tunnel (~27 ms per dispatch; h2d measured ~25-30 MB/s —
a co-located TPU host moves the same 32 MB over PCIe in ~2 ms). The
tunnel-adjusted e2e subtracts the *directly measured* per-run tunnel penalty:
p50(fused with host-resident inputs) − p50(fused with device-resident
inputs) for the identical program, plus the measured d2h fetch of the RGB
output, minus a 3 ms PCIe allowance.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline", "extra"}.
"""
import functools
import json
import time

import numpy as np

BASELINE_NO_WARP_MS = 348.21  # reference README.md:63, --target-crs none
PCIE_ALLOWANCE_MS = 3.0       # 32 MB h2d + 12.6 MB d2h at ~16 GB/s


def _p50(fn, n, warmup=1):
    for _ in range(warmup):
        fn()
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append((time.perf_counter() - t0) * 1000.0)
    return float(np.percentile(ts, 50)), [round(t, 1) for t in ts]


def main():
    import jax
    import jax.numpy as jnp

    from benchmarks import e2e as e2e_mod
    from sarpro_tpu.core import fused
    from sarpro_tpu.types import AutoscaleStrategy

    side = 20000  # 400 MP per band

    # ---- 1. device-resident full-res p50 (the per-chip compute number) ----
    k1, k2 = jax.random.split(jax.random.PRNGKey(42))

    @jax.jit
    def gen(k, mean):
        x = jnp.exp(mean + 1.1 * jax.random.normal(k, (side, side)))
        zeros = jax.random.bernoulli(jax.random.fold_in(k, 1), 0.01, (side, side))
        return jnp.where(zeros, 0, jnp.clip(x, 0, 65535)).astype(jnp.uint16)

    vv_d = gen(k1, 5.0)
    vh_d = gen(k2, 4.2)
    _ = int(np.asarray(jnp.sum(vv_d.astype(jnp.float32))))  # materialize

    fn = functools.partial(
        fused.synrgb_pipeline, strategy=AutoscaleStrategy.CLAHE,
        target_size=2048, pad=True,
    )

    def run_resident():
        out = fn(vv_d, vh_d)
        # force completion with a scalar fetch: block_until_ready is a no-op
        # under the axon remote platform
        return int(np.asarray(jnp.max(out.astype(jnp.int32))))

    assert run_resident() > 0
    dev_p50, dev_times = _p50(run_resident, 10)

    # ---- 2. end-to-end from disk (the claim BASELINE.json makes) ----------
    e2e = e2e_mod.run_e2e(runs=7)
    breakdown = e2e_mod.run_breakdown()

    # ---- 3. directly measured per-run tunnel penalty ----------------------
    # identical decimated-shape program, host-resident vs device-resident
    # inputs (the axon tunnel re-ships host arrays per execution)
    rng = np.random.default_rng(3)
    host_planes = [
        np.exp(rng.normal(m, 1.1, (2048, 2048))).astype(np.float32)
        for m in (5.0, 4.2)
    ]
    small = functools.partial(
        fused.synrgb_pipeline, strategy=AutoscaleStrategy.CLAHE,
        target_size=2048, pad=True,
    )

    def run_host_inputs():
        out = small(host_planes[0], host_planes[1])
        return int(np.asarray(out[0, 0, 0]))

    dev_planes = [jnp.asarray(p) for p in host_planes]
    for d in dev_planes:
        np.asarray(d[0, 0])

    def run_dev_inputs():
        out = small(dev_planes[0], dev_planes[1])
        return int(np.asarray(out[0, 0, 0]))

    host_in_p50, _ = _p50(run_host_inputs, 5)
    dev_in_p50, _ = _p50(run_dev_inputs, 5)
    h2d_penalty = max(host_in_p50 - dev_in_p50, 0.0)

    def fetch_rgb():
        out = small(dev_planes[0], dev_planes[1])
        int(np.asarray(out[0, 0, 0]))  # complete on device
        t0 = time.perf_counter()
        np.asarray(out)
        return (time.perf_counter() - t0) * 1000.0

    d2h_ms = float(np.percentile([fetch_rgb() for _ in range(3)], 50))

    adjusted = max(e2e["p50_ms"] - h2d_penalty - d2h_ms + PCIE_ALLOWANCE_MS, 0.0)
    dev = jax.devices()[0]

    print(json.dumps({
        "metric": "400MP dual-pol SAFE disk->2048 CLAHE synRGB JPEG e2e p50 "
                  "(tunnel-adjusted; raw + breakdown in extra)",
        "value": round(adjusted, 1),
        "unit": "ms",
        "vs_baseline": round(BASELINE_NO_WARP_MS / adjusted, 2),
        "extra": {
            "e2e_raw_p50_ms": round(e2e["p50_ms"], 1),
            "e2e_raw_vs_baseline": round(BASELINE_NO_WARP_MS / e2e["p50_ms"], 2),
            "e2e_times_ms": e2e["times_ms"],
            "breakdown": breakdown,
            "tunnel": {
                "h2d_penalty_ms": round(h2d_penalty, 1),
                "d2h_fetch_ms": round(d2h_ms, 1),
                "host_input_run_p50_ms": round(host_in_p50, 1),
                "device_input_run_p50_ms": round(dev_in_p50, 1),
                "pcie_allowance_ms": PCIE_ALLOWANCE_MS,
                "note": "axon remote tunnel: ~27ms/dispatch, h2d ~25-30MB/s; "
                        "co-located hosts pay ~2-3ms for the same bytes",
            },
            "device_resident_fullres_p50_ms": round(dev_p50, 1),
            "device_resident_times_ms": dev_times,
            "device_resident_mp_per_s": round(400.0 / (dev_p50 / 1000.0), 1),
            "host": "1 CPU core, ~1 GB/s disk (reference: 12-core M4 Pro)",
            "device": str(dev),
        },
    }))


if __name__ == "__main__":
    main()
