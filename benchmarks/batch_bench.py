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


_COLD_IO_SNIPPET = """\
import sys, os, json, time, pathlib, shutil
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
from sarpro_tpu import api
from sarpro_tpu.params import ProcessingParams
from sarpro_tpu.parallel.batch import process_directory_pipelined
from sarpro_tpu.types import (AutoscaleStrategy, BitDepthArg, OutputFormat,
                              Polarization)

indir = pathlib.Path({indir!r})
outroot = pathlib.Path({outroot!r})


def evict():
    # drop every scene byte from the page cache so each arm's reads are
    # REAL disk I/O (measured ~75 MB/s, ~11% CPU on this host) instead of
    # ~1 GB/s memcpy from cache
    for p in indir.rglob("*"):
        if p.is_file():
            fd = os.open(p, os.O_RDONLY)
            try:
                os.posix_fadvise(fd, 0, 0, os.POSIX_FADV_DONTNEED)
            finally:
                os.close(fd)


def arm_out(name):
    out = outroot / name
    if out.exists():
        shutil.rmtree(out)
    out.mkdir(parents=True)
    return out


results = {{}}
configs = (
    ("jpeg_synrgb", ProcessingParams(
        format=OutputFormat.JPEG, polarization=Polarization.MULTIBAND,
        autoscale=AutoscaleStrategy.CLAHE, size={out_size},
        resample_alg=None)),
    ("config5_multiband_u16_geotiff_4326_cubic", ProcessingParams(
        format=OutputFormat.TIFF, bit_depth=BitDepthArg.U16,
        polarization=Polarization.MULTIBAND,
        target_crs="EPSG:4326", resample_alg="cubic", size={out_size})),
)
for cfg_name, params in configs:
    arms = (
        ("serial", lambda out, p=params: api.process_directory_to_path(
            indir, out, p, fast=True)),
        ("pipelined_prefetch2", lambda out, p=params:
            process_directory_pipelined(indir, out, p, prefetch=2,
                                        fast=True, device_batch=1)),
    )
    for name, fn in arms:  # warm-cache warmup compiles both arms' programs
        fn(arm_out(cfg_name + "_" + name))
    walls = {{name: [] for name, _ in arms}}
    reports = {{}}
    for _ in range({reps}):
        for name, fn in arms:
            evict()
            t0 = time.perf_counter()
            rep = fn(arm_out(cfg_name + "_" + name))
            walls[name].append(time.perf_counter() - t0)
            reports[name] = (rep.processed, rep.skipped, rep.errors)
    results[cfg_name] = {{
        name: {{"wall_s_median": round(float(np.median(w)), 2),
                "wall_s_all": [round(x, 2) for x in w],
                "processed": reports[name][0], "skipped": reports[name][1],
                "errors": reports[name][2]}}
        for name, w in walls.items()}}
    s = results[cfg_name]
    s["speedup"] = round(s["serial"]["wall_s_median"]
                         / s["pipelined_prefetch2"]["wall_s_median"], 2)
print(json.dumps(results))
"""


_OVERLAP_SNIPPET = """\
import sys, os, json, time, pathlib, shutil
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
from sarpro_tpu import api
from sarpro_tpu.io import raster as raster_mod
from sarpro_tpu.params import ProcessingParams
from sarpro_tpu.parallel.batch import process_directory_pipelined
from sarpro_tpu.types import AutoscaleStrategy, OutputFormat, Polarization

indir = pathlib.Path({indir!r})
outroot = pathlib.Path({outroot!r})
params = ProcessingParams(
    format=OutputFormat.JPEG, polarization=Polarization.MULTIBAND,
    autoscale=AutoscaleStrategy.CLAHE, size={out_size}, resample_alg=None)


def evict():
    for p in indir.rglob("*"):
        if p.is_file():
            fd = os.open(p, os.O_RDONLY)
            try:
                os.posix_fadvise(fd, 0, 0, os.POSIX_FADV_DONTNEED)
            finally:
                os.close(fd)


def arm_out(name):
    out = outroot / name
    if out.exists():
        shutil.rmtree(out)
    out.mkdir(parents=True)
    return out


def serial(out):
    return api.process_directory_to_path(indir, out, params, fast=True)


def serial_direct(out):
    tok = raster_mod.DIRECT_IO.set(True)
    try:
        return api.process_directory_to_path(indir, out, params, fast=True)
    finally:
        raster_mod.DIRECT_IO.reset(tok)


def pipelined(out):
    return process_directory_pipelined(indir, out, params, prefetch=2,
                                       fast=True, device_batch=1)


arms = (("serial_buffered", serial), ("serial_direct", serial_direct),
        ("pipelined_prefetch2", pipelined))
for name, fn in arms:  # warm-cache warmup compiles everything
    fn(arm_out(name))
walls = {{name: [] for name, _ in arms}}
reports = {{}}
for _ in range({reps}):
    for name, fn in arms:
        evict()
        t0 = time.perf_counter()
        rep = fn(arm_out(name))
        walls[name].append(time.perf_counter() - t0)
        reports[name] = (rep.processed, rep.skipped, rep.errors)
res = {{
    name: {{"wall_s_median": round(float(np.median(w)), 2),
            "wall_s_all": [round(x, 2) for x in w],
            "processed": reports[name][0], "skipped": reports[name][1],
            "errors": reports[name][2]}}
    for name, w in walls.items()}}
res["speedup_vs_serial"] = round(
    res["serial_buffered"]["wall_s_median"]
    / res["pipelined_prefetch2"]["wall_s_median"], 2)
res["speedup_overlap_only"] = round(
    res["serial_direct"]["wall_s_median"]
    / res["pipelined_prefetch2"]["wall_s_median"], 2)
print(json.dumps(res))
"""


def run_overlap_arm(n_scenes: int = 4, side: int = 24000,
                    out_size: int = 1024, reps: int = 3) -> dict:
    """The arm that CAN exceed 1x (VERDICT r4 item 4): big scenes whose
    O_DIRECT DMA read time (~2.7 GB/s at ~9% vCPU here) is comparable to
    the per-scene compute, device = XLA CPU (no tunnel), page cache evicted
    per rep. Three arms decompose the win:

      * serial_buffered — the reference-semantics serial loop (inline
        buffered reads).
      * serial_direct — same loop with O_DIRECT reads: isolates the read
        path's own speed from overlap.
      * pipelined_prefetch2 — the pipelined driver (O_DIRECT loaders by
        default): read DMA of scene N+1 genuinely overlaps scene N's
        compute even on this 1-core host.

    speedup_overlap_only (serial_direct/pipelined) is pure driver overlap;
    speedup_vs_serial is what a user upgrading from the serial loop sees.
    """
    import subprocess

    indir = ensure_scenes(n_scenes, side)
    outroot = DATA / "overlap"
    outroot.mkdir(parents=True, exist_ok=True)
    snippet = _OVERLAP_SNIPPET.format(repo=str(REPO), indir=str(indir),
                                      outroot=str(outroot),
                                      out_size=out_size, reps=reps)
    env = dict(__import__("os").environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PYTHONPATH", None)
    out = subprocess.run([sys.executable, "-c", snippet], env=env,
                         capture_output=True, text=True, check=True)
    results = json.loads(out.stdout.strip().splitlines()[-1])
    results["config"] = (f"{n_scenes} scenes, {side}x{side} dual-pol u16 -> "
                         f"{out_size} CLAHE synRGB JPEG (--fast), CPU "
                         f"backend, page cache evicted per rep")
    results["note"] = (
        "the 9+ GB working set exceeds every cache, so reads hit the real "
        "disk (measured ~0.9 GB/s single-stream O_DIRECT, ~1.2 GB/s at "
        "queue depth 4); the pipelined driver's wall converges to the "
        "aggregate disk floor (all compute hidden behind DMA), while the "
        "serial loop pays I/O + compute in sequence — and serial_buffered "
        "additionally burns the core faulting pages (~94% CPU) instead of "
        "DMA-waiting (~9%). Through-tunnel arms cannot show overlap "
        "because one serialized RPC link carries every byte both ways")
    return results


def run_cold_io(indir: pathlib.Path, out_size: int, reps: int = 3) -> dict:
    """Cold-page-cache CPU-backend arms (VERDICT r4 item 4).

    The through-tunnel arms above cannot show the pipelined driver's
    overlap: every byte rides one serialized RPC link, so pipelined ==
    serial by construction. This arm removes the tunnel (device = XLA CPU
    in a subprocess) and makes the read stage REAL disk I/O by evicting
    the scene files from the page cache before every rep — the loader
    thread's disk DMA (~89% non-CPU) genuinely overlaps the consumer's
    compute + encode even on this 1-core host. Two configs:

      * jpeg_synrgb — the same config as the tunnel arms (CPU work/scene
        ~1.4 s ≈ cold-read wall ~1.3 s: maximal overlap headroom).
      * config5_multiband_u16_geotiff_4326_cubic — BASELINE.json config #5
        as declared (multiband u16 GeoTIFF reprojected to EPSG:4326,
        cubic); CPU work/scene ~0.3 s, so its ceiling is lower.
    """
    import subprocess

    outroot = DATA / "cold_io"
    outroot.mkdir(parents=True, exist_ok=True)
    snippet = _COLD_IO_SNIPPET.format(repo=str(REPO), indir=str(indir),
                                      outroot=str(outroot),
                                      out_size=out_size, reps=reps)
    env = dict(__import__("os").environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PYTHONPATH", None)
    out = subprocess.run([sys.executable, "-c", snippet], env=env,
                         capture_output=True, text=True, check=True)
    results = json.loads(out.stdout.strip().splitlines()[-1])
    results["note"] = (
        "device = XLA CPU backend in a fresh subprocess (no tunnel); page "
        "cache evicted (posix_fadvise DONTNEED) before every rep; serial "
        "vs prefetch-2 pipelined over the same real directory APIs. These "
        "small scenes re-enter the cache in one touch, so there is little "
        "to overlap — the big-scene overlap_arm is the demonstration "
        "measurement. config5's warp legitimately executes device programs "
        "INSIDE the loader threads (the documented reader-open exception), "
        "which on a 1-core CPU backend timeshares against the consumer's "
        "programs — its pipelined column measures that contention, not "
        "driver overhead; on a real accelerator the warp runs on-device")
    return results


def run(n_scenes: int = 6, side: int = 5000, out_size: int = 1024) -> dict:
    from sarpro_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()
    from sarpro_tpu import api
    from sarpro_tpu.params import ProcessingParams
    from sarpro_tpu.parallel.batch import process_directory_pipelined
    from sarpro_tpu.types import AutoscaleStrategy, OutputFormat, Polarization

    indir = ensure_scenes(n_scenes, side)
    # resample_alg=None = the CLI's batch semantics (reader heuristic →
    # native average box reduce for the ≥4× reduction here). The
    # ProcessingParams DEFAULT ("lanczos", the reference API default) would
    # instead full-read and Lanczos-resample each band as a standalone
    # device program INSIDE the loader threads — slower everywhere and
    # device work where the pipelined loader must be host-only.
    params = ProcessingParams(
        format=OutputFormat.JPEG, polarization=Polarization.MULTIBAND,
        autoscale=AutoscaleStrategy.CLAHE, size=out_size, resample_alg=None,
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
    results["cold_io_cpu_backend"] = run_cold_io(indir, out_size)
    results["overlap_arm"] = run_overlap_arm()
    return results


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    side = int(sys.argv[2]) if len(sys.argv) > 2 else 5000
    out_size = int(sys.argv[3]) if len(sys.argv) > 3 else 1024
    res = run(n, side, out_size)
    print(json.dumps(res, indent=2))
    (REPO / "benchmarks" / "batch_results.json").write_text(
        json.dumps(res, indent=2))
