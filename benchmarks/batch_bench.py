"""Batch throughput benchmark: serial vs pipelined drivers over N scenes.

The reference's batch loop is strictly serial (api/mod.rs:502-533: read,
process, write per product). The pipelined driver
(parallel/batch.py:process_directory_pipelined) prefetches scene reads on a
host thread so device compute overlaps the next scene's I/O, and with
fast=True defers encode+file-write to a dedicated writer thread so the
device starts scene N+1 while scene N encodes (VERDICT r2 item 3) — the
inter-scene parallelism SURVEY.md §2.5 calls for. Both arms here run the
fused fast path, so the speedup isolates pipelining. This benchmark builds
N synthetic dual-pol SAFEs on disk and measures scenes/second through the
REAL directory APIs (everything included: SAFE parse, read+reduce, device,
JPEG write, sidecars).

Usage: python benchmarks/batch_bench.py [n_scenes] [side]
Writes benchmarks/batch_results.json.
"""
from __future__ import annotations

import json
import pathlib
import shutil
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

REPO = pathlib.Path(__file__).resolve().parent.parent
DATA = REPO / ".bench" / "batch"


def ensure_scenes(n: int, side: int) -> pathlib.Path:
    sys.path.insert(0, str(REPO / "tests"))
    import fixtures

    root = DATA / f"in_{n}x{side}"
    marker = root / ".complete"
    if marker.exists():
        return root
    if root.exists():
        shutil.rmtree(root)
    root.mkdir(parents=True)
    rng = np.random.default_rng(1)
    for i in range(n):
        base = root / f"S1A_IW_GRDH_1SDV_2025071{i}T000000.SAFE"
        fixtures.make_safe(
            root, name=base.name, pols=("vv", "vh"), shape=(side, side),
            seed=int(rng.integers(0, 1 << 31)),
        )
    marker.write_text("ok")
    return root


def stage_ablation(indir: pathlib.Path, params, out_size: int,
                   n_scenes: int) -> dict:
    """Per-stage singles + a transfer-free resident arm (VERDICT r3 item 5):
    demonstrates (rather than asserts) which stage bounds the pipelined
    batch drivers.

    Stages per scene: host read+reduce (loader thread work), h2d transfer
    of the reduced planes (the consumer's dispatch-time device_put),
    device program (rep-differenced inside one jit), result fetch + JPEG
    encode (writer thread work). The RESIDENT arm then runs the real
    process-and-write loop over pre-uploaded DN — the pipeline with the
    read and transfer stages removed; its scenes/s is the throughput the
    pipelined driver converges to when transfers are free (a co-located
    PCIe host)."""
    import concurrent.futures
    import time as _time

    import jax
    import jax.numpy as jnp
    import numpy as np

    from sarpro_tpu import api
    from sarpro_tpu.core import fast_path, fused
    from sarpro_tpu.io.safe import SafeReader

    paths = sorted(p for p in indir.iterdir() if p.is_dir())[:n_scenes]

    # --- read stage (host-only, what a loader thread does) -----------------
    t0 = _time.perf_counter()
    readers = []
    from sarpro_tpu.io.safe import DEFER_DEVICE_PUT

    token = DEFER_DEVICE_PUT.set(True)
    try:
        per_read = []
        for p in paths:
            t1 = _time.perf_counter()
            r = SafeReader.open_with_options(
                p, api._pol_to_reader_hint(params.polarization), None, None,
                params.size)
            per_read.append(_time.perf_counter() - t1)
            readers.append(r)
    finally:
        DEFER_DEVICE_PUT.reset(token)
    read_s = _time.perf_counter() - t0

    pairs_host = [api._band_pair(r, "Multiband")[:2] for r in readers]

    # --- h2d transfer stage ------------------------------------------------
    def ship(pair):
        a = jnp.asarray(pair[0])
        b = jnp.asarray(pair[1])
        int(np.asarray(a[0, 0]))
        int(np.asarray(b[0, 0]))
        return a, b

    per_xfer = []
    pairs_dev = []
    for pair in pairs_host:
        t1 = _time.perf_counter()
        pairs_dev.append(ship(pair))
        per_xfer.append(_time.perf_counter() - t1)
    bytes_per_scene = sum(np.asarray(p).nbytes for p in pairs_host[0])

    # --- device stage (rep-differenced) ------------------------------------
    from sarpro_tpu.io.writers.jpeg import preferred_synrgb_layout

    layout = preferred_synrgb_layout()
    a0, b0 = pairs_dev[0]

    def runner(r):
        @jax.jit
        def run(a, b):
            acc = jnp.int32(0)
            for i in range(r):
                out = fused.synrgb_pipeline(
                    a + i, b, strategy=params.autoscale,
                    target_size=params.size, pad=params.pad,
                    channel_order=layout)
                acc = acc + jnp.max(out.astype(jnp.int32))
            return acc

        run(a0, b0)
        return lambda: int(np.asarray(run(a0, b0)))

    one, many = runner(1), runner(5)

    def wall(fn):
        t = _time.perf_counter()
        fn()
        return _time.perf_counter() - t

    t_one = min(wall(one) for _ in range(3))
    t_many = min(wall(many) for _ in range(3))
    device_s = max((t_many - t_one) / 4.0, 0.0)

    # --- fetch + encode stage (writer thread work) -------------------------
    out = DATA / "ablation"
    out.mkdir(parents=True, exist_ok=True)
    rgb = fused.synrgb_pipeline(a0, b0, strategy=params.autoscale,
                                target_size=params.size, pad=params.pad,
                                channel_order=layout)
    int(np.asarray(jnp.max(rgb[:1, :1].astype(jnp.int32))))
    t1 = _time.perf_counter()
    host_rgb = np.asarray(rgb)
    fetch_s = _time.perf_counter() - t1
    from sarpro_tpu.io.writers.jpeg import write_synrgb_jpeg

    enc = []
    for _ in range(5):
        t1 = _time.perf_counter()
        write_synrgb_jpeg(out / "abl.jpg", out_size, out_size, host_rgb,
                          layout=layout)
        enc.append(_time.perf_counter() - t1)
    encode_s = min(enc)

    # --- resident arm: real process+write loop, transfers removed ----------
    walls = []
    with concurrent.futures.ThreadPoolExecutor(1) as pool:
        for _ in range(3):
            t1 = _time.perf_counter()
            futs = []
            for i, (da, db) in enumerate(pairs_dev):
                futs.append(fast_path.save_multiband_fast(
                    da, db, out / f"res{i}.jpg", params.format,
                    params.bit_depth.to_bit_depth(), params.size,
                    readers[i].metadata, params.pad, params.autoscale,
                    write_pool=pool))
            for f in futs:
                if f is not None:
                    f.result()
            walls.append(_time.perf_counter() - t1)
    resident_s = float(np.median(walls))

    stages = {
        "read_reduce_s_per_scene": round(read_s / len(paths), 3),
        "h2d_transfer_s_per_scene": round(float(np.median(per_xfer)), 3),
        "h2d_bytes_per_scene": int(bytes_per_scene),
        "device_s_per_scene": round(device_s, 3),
        "fetch_s_per_scene": round(fetch_s, 3),
        "encode_s_per_scene": round(encode_s, 3),
    }
    bound = max(stages["read_reduce_s_per_scene"],
                stages["h2d_transfer_s_per_scene"],
                stages["device_s_per_scene"],
                stages["fetch_s_per_scene"] + stages["encode_s_per_scene"])
    return {
        "stages": stages,
        "max_stage": round(bound, 3),
        "pipeline_bound_scenes_per_s": round(1.0 / bound, 3) if bound else None,
        "resident_arm": {
            "wall_s_median": round(resident_s, 2),
            "wall_s_all": [round(w, 2) for w in walls],
            "scenes_per_s": round(len(paths) / resident_s, 3),
            "note": "real process+write loop over pre-uploaded DN — the "
                    "pipeline with read and h2d removed; output fetch "
                    "still rides the tunnel",
        },
        "note": "single-scene stage times; the pipelined driver's "
                "steady-state is bounded by max(stage). h2d/fetch ride the "
                "axon RPC tunnel here (a PCIe host moves the same bytes in "
                "~1-3 ms)",
    }


def run(n_scenes: int = 6, side: int = 5000, out_size: int = 1024) -> dict:
    from sarpro_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()
    from sarpro_tpu import api
    from sarpro_tpu.params import ProcessingParams
    from sarpro_tpu.parallel.batch import process_directory_pipelined
    from sarpro_tpu.types import AutoscaleStrategy, OutputFormat, Polarization

    indir = ensure_scenes(n_scenes, side)
    params = ProcessingParams(
        format=OutputFormat.JPEG, polarization=Polarization.MULTIBAND,
        autoscale=AutoscaleStrategy.CLAHE, size=out_size,
    )

    arms = (
        ("serial", lambda out: api.process_directory_to_path(
            indir, out, params, fast=True)),
        ("pipelined_prefetch2", lambda out: process_directory_pipelined(
            indir, out, params, prefetch=2, fast=True, device_batch=1)),
        ("pipelined_devbatch3", lambda out: process_directory_pipelined(
            indir, out, params, prefetch=3, fast=True, device_batch=3)),
    )

    def run_arm(name, fn):
        out = DATA / f"out_{name}"
        if out.exists():
            shutil.rmtree(out)
        out.mkdir(parents=True)
        t0 = time.perf_counter()
        report = fn(out)
        return time.perf_counter() - t0, report

    # warmup both arms once (jit compile, page cache)
    for name, fn in arms:
        run_arm(name, fn)
    # interleave A/B repetitions: the tunnel's bandwidth swings 2-40 MB/s
    # across minutes, so back-to-back arms sample different weather —
    # interleaving + per-arm medians keeps the comparison honest
    reps = 3
    walls = {name: [] for name, _ in arms}
    report_by = {}
    for _ in range(reps):
        for name, fn in arms:
            dt, report = run_arm(name, fn)
            walls[name].append(dt)
            report_by[name] = report
    results = {}
    for name, _ in arms:
        med = float(np.median(walls[name]))
        results[name] = {
            "wall_s_median": round(med, 2),
            "wall_s_all": [round(w, 2) for w in walls[name]],
            "scenes_per_s": round(n_scenes / med, 3),
            "processed": report_by[name].processed,
            "skipped": report_by[name].skipped,
            "errors": report_by[name].errors,
        }
    results["config"] = (f"{n_scenes} scenes, {side}x{side} dual-pol u16 -> "
                        f"{out_size} CLAHE synRGB JPEG (--fast), interleaved "
                        f"median of {reps}")
    results["speedup"] = round(
        results["pipelined_prefetch2"]["scenes_per_s"]
        / results["serial"]["scenes_per_s"], 2)
    results["speedup_devbatch"] = round(
        results["pipelined_devbatch3"]["scenes_per_s"]
        / results["serial"]["scenes_per_s"], 2)
    results["stage_ablation"] = stage_ablation(indir, params, out_size,
                                               n_scenes)
    return results


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    side = int(sys.argv[2]) if len(sys.argv) > 2 else 5000
    out_size = int(sys.argv[3]) if len(sys.argv) > 3 else 1024
    res = run(n, side, out_size)
    print(json.dumps(res, indent=2))
    (REPO / "benchmarks" / "batch_results.json").write_text(
        json.dumps(res, indent=2))
