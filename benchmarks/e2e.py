"""End-to-end (disk → device → file) benchmark for the headline config.

VERDICT r1 items 1-2: the reference's baselines are end-to-end wall times
(`/root/reference/README.md:63`: 348.21 ms for dual-band 400 MP GRD →
2048×2048 synRGB JPEG, no warp, on a 12-core Apple M4 Pro), and round 1 only
measured HBM-resident device compute. This module builds a full-size
synthetic SAFE on local disk (2× 20000×20000 u16 striped contiguous TIFFs,
the real S1 GRD layout) and times the REAL file pipeline
(`api.process_safe_to_path(fast=True)` — the CLI's `--fast` route) from disk
to the written JPEG, plus a read/transfer/compute/fetch/encode breakdown.

Host hardware context recorded alongside the numbers: this environment has
ONE CPU core (vs the reference machine's 12) and the TPU sits behind a
remote RPC tunnel (~27 ms/dispatch, ~140 MB/s host→device measured r1);
both are documented in the emitted JSON so the comparison is honest.
"""
from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
DATA = REPO / ".bench"
SIDE = 20000  # 400 MP per band


def ensure_fullsize_safe(side: int = SIDE, seed: int = 11) -> Path:
    """Generate (once, cached) the full-size synthetic SAFE on disk."""
    name = f"S1A_IW_GRDH_1SDV_BENCH{side}.SAFE"
    base = DATA / name
    marker = base / ".complete"
    if marker.exists():
        return base
    sys.path.insert(0, str(REPO / "tests"))
    import fixtures

    DATA.mkdir(exist_ok=True)
    t0 = time.perf_counter()
    rng = np.random.default_rng(seed)
    # SAR-like lognormal DN, built from a (side/10, side) f32 block tiled
    # with row-rolls — full-size per-element lognormal would cost minutes.
    block_rows = side // 10
    print(f"[e2e] generating {name} (2x {side}x{side} u16)...", file=sys.stderr)

    def gen_band(mean: float) -> np.ndarray:
        blk = rng.lognormal(mean, 1.1, (block_rows, side)).astype(np.float32)
        np.clip(blk, 0, 65535, out=blk)
        blk16 = blk.astype(np.uint16)
        blk16[rng.random((block_rows, side)) < 0.01] = 0
        out = np.empty((side, side), np.uint16)
        for i in range(10):
            out[i * block_rows:(i + 1) * block_rows] = np.roll(
                blk16, 97 * i, axis=1)
        return out

    base.mkdir(parents=True, exist_ok=True)
    (base / "annotation").mkdir(exist_ok=True)
    (base / "measurement").mkdir(exist_ok=True)
    pol_entries = "\n      ".join(
        "<s1sarl1:transmitterReceiverPolarisation>%s"
        "</s1sarl1:transmitterReceiverPolarisation>" % p for p in ("VV", "VH")
    )
    (base / "manifest.safe").write_text(
        fixtures.MANIFEST_TEMPLATE.format(
            product_type="GRD", pass_direction="ASCENDING",
            polarisation_entries=pol_entries,
        )
    )
    for pol, mean in (("vv", 5.0), ("vh", 4.2)):
        (base / "annotation" / f"s1a-iw-grd-{pol}-001.xml").write_text(
            fixtures.ANNOTATION_TEMPLATE.format(
                product_type="GRD", pol=pol.upper(),
                pass_direction="ASCENDING", samples=side, lines=side,
                geolocation_block="",
            )
        )
        fixtures._write_measurement_tiff(
            base / "measurement" / f"s1a-iw-grd-{pol}-001.tiff",
            gen_band(mean),
        )
    marker.write_text("ok")
    print(f"[e2e] generated in {time.perf_counter() - t0:.1f}s", file=sys.stderr)
    return base


def run_e2e(runs: int = 5, strategy: str = "clahe") -> dict:
    """p50 end-to-end wall time of the real --fast CLI pipeline."""
    from sarpro_tpu import api
    from sarpro_tpu.params import ProcessingParams
    from sarpro_tpu.types import (
        AutoscaleStrategy, OutputFormat, Polarization,
    )

    base = ensure_fullsize_safe()
    out = DATA / f"e2e_{strategy}.jpg"
    params = ProcessingParams(
        format=OutputFormat.JPEG, polarization=Polarization.MULTIBAND,
        autoscale=AutoscaleStrategy(strategy), size=2048, pad=True,
        # CLI default: unspecified → reader heuristic (Average for the 9.8x
        # reduction here), exactly the reference CLI's downsample-on-read
        resample_alg=None,
    )
    times = []
    for i in range(runs + 1):  # first run is warmup (jit compile)
        t0 = time.perf_counter()
        api.process_safe_to_path(base, out, params, fast=True)
        dt = (time.perf_counter() - t0) * 1000.0
        if i > 0:
            times.append(dt)
    return {
        "p50_ms": float(np.percentile(times, 50)),
        "times_ms": [round(t, 1) for t in times],
        "config": f"disk 400MP dual-pol SAFE -> 2048 {strategy} synRGB JPEG "
                  f"(--fast), pad",
    }


_READ_STAGE_SNIPPET = """\
import sys, time, json, mmap
import numpy as np
sys.path.insert(0, {repo!r})
from sarpro_tpu.io.raster import RasterReader
from sarpro_tpu.io.tiffio import TiffReader
from sarpro_tpu import _native
total_min = 0.0
total_p50 = 0.0
floor_min = 0.0
for p in {paths!r}:
    # the DRAM traversal floor, INTERLEAVED with the reduce reps in this
    # same window: this host's DRAM bandwidth swings 25-40% in multi-minute
    # phases, so stage/floor ratios are only meaningful when both sides
    # sample the SAME phase (r4's 1.41x 'gap' was a floor measured in a
    # fast phase against a stage measured in a slow one)
    t = TiffReader(p)
    fh = open(p, "rb")
    mm = mmap.mmap(fh.fileno(), 0, prot=mmap.PROT_READ)
    src = np.frombuffer(mm, dtype=np.uint16, count=t.height * t.width,
                        offset=int(t.offsets[0]))
    ts, fs = [], []
    for _ in range(5):
        t0 = time.perf_counter()
        arr = RasterReader(p).read_band_resampled(1, 2048, 2048, "average")
        ts.append((time.perf_counter() - t0) * 1000.0)
        t0 = time.perf_counter()
        _native.stream_sum_u16(src)
        fs.append((time.perf_counter() - t0) * 1000.0)
    del src
    mm.close(); fh.close(); t.close()
    total_min += min(ts)
    total_p50 += float(np.percentile(ts, 50))
    floor_min += min(fs)
    np.save({out!r} + "/" + p.rsplit("/", 1)[1] + ".npy", arr)
print(json.dumps({{"ms": total_min, "p50_ms": total_p50, "reps": 5,
                   "floor_ms": floor_min,
                   "vs_floor_same_window": round(total_min / floor_min, 3)
                   if floor_min else None}}))
"""

_JPEG_STAGE_SNIPPET = """\
import sys, time, json
import numpy as np
sys.path.insert(0, {repo!r})
from sarpro_tpu.io.writers.jpeg import write_synrgb_jpeg
arr = np.load({npy!r})
ts = []
for _ in range(12):
    t0 = time.perf_counter()
    write_synrgb_jpeg({jpg!r}, 2048, 2048, arr, layout={layout!r})
    ts.append((time.perf_counter() - t0) * 1000.0)
print(json.dumps({{"ms": min(ts), "p50_ms": float(np.percentile(ts, 50)),
                   "reps": 12}}))
"""


def _run_host_stage(snippet: str, settle_s: float = 2.0) -> dict:
    """Run a host stage in a fresh python with no JAX runtime: the bench
    process's tunnel threads share this host's single core and inflate
    min-of-reps by 30-50%; a production host runs these stages on an
    unloaded core. The stage code is the real library path. A short settle
    pause lets the parent's RPC threads drain before timing starts (and
    spaces repeat windows across host DRAM phases)."""
    import subprocess

    time.sleep(settle_s)
    out = subprocess.run([sys.executable, "-c", snippet],
                         capture_output=True, text=True, check=True)
    return json.loads(out.stdout.strip().splitlines()[-1])


def run_breakdown() -> dict:
    """Per-stage timing of the same flow (read/transfer/compute/fetch/write).

    Host stages (read+reduce, JPEG encode) run in clean subprocesses —
    min of reps on an otherwise idle core (see _run_host_stage). Device
    compute uses rep-differencing inside one dispatch ((t(6 reps) - t(1))/5
    with per-rep perturbed inputs so XLA cannot CSE them) — a single
    dispatch+fetch measurement would embed two ~27 ms RPC round-trips a
    co-located host does not pay."""
    import jax
    import jax.numpy as jnp

    from sarpro_tpu.core import fused
    from sarpro_tpu.types import AutoscaleStrategy

    base = ensure_fullsize_safe()
    paths = sorted((base / "measurement").glob("*.tiff"))

    def t(fn):
        t0 = time.perf_counter()
        r = fn()
        return (time.perf_counter() - t0) * 1000.0, r

    stage_dir = DATA / "stages"
    stage_dir.mkdir(exist_ok=True)
    read = _run_host_stage(_READ_STAGE_SNIPPET.format(
        repo=str(REPO), paths=[str(p) for p in paths], out=str(stage_dir)))
    read_ms = read["ms"]
    planes = [np.load(stage_dir / (p.name + ".npy")) for p in paths]

    def xfer():
        devs = [jnp.asarray(a) for a in planes]
        for d in devs:
            np.asarray(d[0, 0])  # force the host->device ship
        return devs

    xfer_ms, dev = t(xfer)

    def reps_runner(r, make):
        @jax.jit
        def run(a, b):
            acc = jnp.int32(0)
            for i in range(r):
                acc = acc + make(a + i, b + i)
            return acc
        run(dev[0], dev[1])  # compile
        return lambda: int(np.asarray(run(dev[0], dev[1])))

    def rep_diff(make):
        one = reps_runner(1, make)
        many = reps_runner(6, make)
        t1 = min(t(one)[0] for _ in range(3))
        t6 = min(t(many)[0] for _ in range(3))
        return max((t6 - t1) / 5.0, 0.0)

    def _stage(x, copol):
        return fused.synrgb_band_stage(
            x, strategy=AutoscaleStrategy.CLAHE, copol=copol,
            target_size=2048, pad=True)

    # measure the PRODUCTION co-located layout: with the native encoder
    # built, the fused program ends in the in-graph JPEG front-end (DCT
    # layout) and the host pays entropy coding only. (The transport-aware
    # preferred_synrgb_layout() picks u8 planes on the axon tunnel where
    # fetch bytes dominate — but the component sum models a PCIe host.)
    from sarpro_tpu import _native
    from sarpro_tpu.io.writers.jpeg import preferred_synrgb_layout

    layout = "dct" if _native.available() else preferred_synrgb_layout()

    # max-reduce (not a single-element read) so XLA cannot dead-code the
    # per-block DCT work outside the fetched element
    comp_ms = rep_diff(lambda a, b: jnp.max(fused.synrgb_pipeline(
        a, b, strategy=AutoscaleStrategy.CLAHE, target_size=2048,
        pad=True, channel_order=layout).astype(jnp.int32)))
    # the overlapped fast path (api.py) dispatches band 1's program while
    # band 2 is still reading from disk; after the last byte lands only
    # band 2's stage + the combine remain on the critical path — measure
    # the split-program total and band 1's share separately
    split_ms = rep_diff(lambda a, b: jnp.max(fused.synrgb_combine_stage(
        _stage(a, True), _stage(b, False), strategy=AutoscaleStrategy.CLAHE,
        suppressed=None, channel_order=layout).astype(jnp.int32)))
    stage1_ms = rep_diff(
        lambda a, b: _stage(a, True)[0, 0].astype(jnp.int32))
    tail_ms = max(split_ms - stage1_ms, 0.0)

    out = fused.synrgb_pipeline(dev[0], dev[1],
                                strategy=AutoscaleStrategy.CLAHE,
                                target_size=2048, pad=True,
                                channel_order=layout)
    _ = int(np.asarray(out.ravel()[0]))
    fetch_ms, host_arr = t(lambda: np.asarray(out))
    npy = stage_dir / "synrgb_out.npy"
    np.save(npy, np.asarray(host_arr))
    write = _run_host_stage(_JPEG_STAGE_SNIPPET.format(
        repo=str(REPO), npy=str(npy), jpg=str(DATA / "bd.jpg"),
        layout=layout))
    # this host's DRAM bandwidth swings in multi-minute phases (100->366 ms
    # observed for the same reducer call); min-of-reps inside ONE subprocess
    # samples a single phase. Pin each host stage over THREE spaced windows
    # (VERDICT r4 item 3) and report min AND spread — a 30 ms phase swing
    # must be visible in the artifact, not silently folded into the min.
    reads = [read] + [
        _run_host_stage(_READ_STAGE_SNIPPET.format(
            repo=str(REPO), paths=[str(p) for p in paths],
            out=str(stage_dir)), settle_s=4.0)
        for _ in range(2)]
    writes = [write] + [
        _run_host_stage(_JPEG_STAGE_SNIPPET.format(
            repo=str(REPO), npy=str(npy), jpg=str(DATA / "bd.jpg"),
            layout=layout), settle_s=4.0)
        for _ in range(2)]
    read_best = min(reads, key=lambda r: r["ms"])
    write_best = min(writes, key=lambda r: r["ms"])
    read_ms = read_best["ms"]
    write_ms = write_best["ms"]

    def _stage_stats(windows, key="ms"):
        mins = [w[key] for w in windows]
        best = min(windows, key=lambda w: w[key])
        return {
            "min_ms": round(min(mins), 1),
            "p50_ms": round(best["p50_ms"], 1),
            "windows": len(windows),
            "reps_per_window": best.get("reps", 0),
            "window_mins_ms": [round(m, 1) for m in mins],
            "spread_pct": round(100.0 * (max(mins) - min(mins)) / min(mins),
                                1),
        }

    ratios = [r["vs_floor_same_window"] for r in reads
              if r.get("vs_floor_same_window")]
    return {
        "read_reduce_ms": round(read_ms, 1),
        # stage/floor measured INTERLEAVED in the same subprocess window —
        # the only phase-fair form of this ratio on a host whose DRAM
        # bandwidth swings 25-40% between windows (VERDICT r4 item 2)
        "read_reduce_vs_floor_same_window": round(min(ratios), 3)
        if ratios else None,
        "read_floor_same_window_ms": round(
            min(r["floor_ms"] for r in reads if r.get("floor_ms")), 1)
        if ratios else None,
        "host_stage_stats": {
            "read_reduce": _stage_stats(reads),
            "jpeg_entropy": _stage_stats(writes),
        },
        "h2d_transfer_ms": round(xfer_ms, 1),
        "device_compute_ms": round(comp_ms, 1),
        "device_split_total_ms": round(split_ms, 1),
        "device_band1_hidden_ms": round(stage1_ms, 1),
        "device_tail_ms": round(tail_ms, 1),
        "d2h_fetch_ms": round(fetch_ms, 1),
        "jpeg_write_ms": round(write_ms, 1),
        "jpeg_layout": layout,
        "note": "read (dual-band single-pass native box reduce from disk) "
                "and jpeg encode are min-of-reps in clean no-JAX "
                "subprocesses (idle-core stage time); device compute is "
                "rep-differenced inside one dispatch; transfer/fetch ride "
                "the axon RPC tunnel (~27ms/dispatch) and are replaced by "
                "the PCIe allowance in the component sum. jpeg_layout 'dct' "
                "= the JPEG front-end (level shift + FDCT + q100 quantize) "
                "runs inside the device program and jpeg_write_ms is the "
                "entropy-only host encode. The overlapped fast path hides "
                "band 1's program (device_band1_hidden_ms) and its h2d "
                "under band 2's disk read, leaving device_tail_ms on the "
                "critical path",
    }


# ---------------------------------------------------------------------------
# With-warp arm — the reference's ACTUAL headline configuration
# (/root/reference/README.md:8,63: dual-band 400 MP GRD → 2048×2048 synRGB
# JPEG WITH reprojection + padding, Tamed autoscale, cubic resampling,
# ~1.5 s on the 12-core M4 Pro). The full-size bench SAFE carries the same
# 5×5 WGS84 GCP lattice real S1 GRD products do, so auto-CRS resolves a UTM
# zone and the warp runs the production TPS + two-stage host-reduce +
# tiled-Pallas-sampler path.
# ---------------------------------------------------------------------------

_WARP_HOST_STAGE_SNIPPET = """\
import sys, time, json
import numpy as np
sys.path.insert(0, {repo!r})
from sarpro_tpu.io import geodesy
from sarpro_tpu.io import warp as warp_mod
from sarpro_tpu.io.raster import RasterReader

# auto-CRS resolution (GCP centroid -> UTM zone; once per product)
ts = []
for _ in range(5):
    t0 = time.perf_counter()
    target = geodesy.resolve_auto_target_crs({base!r})
    ts.append((time.perf_counter() - t0) * 1000.0)
auto_ms = min(ts)

plan_ms = 0.0
read_min = 0.0
read_p50 = 0.0
for p in {paths!r}:
    reader = RasterReader(p)
    # warp plan: TPS fit from the GCP lattice + coarse inverse-mapping grid
    # (the real pipeline plans once per band)
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        plan = warp_mod.plan_warp(reader, target, "cubic", 2048)
        ts.append((time.perf_counter() - t0) * 1000.0)
    plan_ms += min(ts)
    two = warp_mod.two_stage_plan(plan, reader.metadata.size_x,
                                  reader.metadata.size_y)
    mid_rows, mid_cols = two[0], two[1]
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        arr = reader.read_band_resampled(1, mid_cols, mid_rows, "average")
        ts.append((time.perf_counter() - t0) * 1000.0)
    read_min += min(ts)
    read_p50 += float(np.percentile(ts, 50))
    np.save({out!r} + "/warpmid_" + p.rsplit("/", 1)[1] + ".npy", arr)
    np.save({out!r} + "/warpmap_" + p.rsplit("/", 1)[1] + ".npy",
            np.stack([two[2], two[3]]))
    reader.close()
print(json.dumps({{"read_ms": read_min, "read_p50_ms": read_p50,
                   "plan_ms": plan_ms, "auto_crs_ms": auto_ms,
                   "target": target, "mid": [mid_rows, mid_cols],
                   "reps": 5}}))
"""


def run_e2e_warp(runs: int = 3) -> dict:
    """p50 raw wall of the real --fast with-warp pipeline (rides the RPC
    tunnel: ~45 MB of mid planes h2d + the coefficient fetch d2h)."""
    from sarpro_tpu import api
    from sarpro_tpu.params import ProcessingParams
    from sarpro_tpu.types import AutoscaleStrategy, OutputFormat, Polarization

    base = ensure_fullsize_safe()
    out = DATA / "e2e_warp.jpg"
    params = ProcessingParams(
        format=OutputFormat.JPEG, polarization=Polarization.MULTIBAND,
        autoscale=AutoscaleStrategy.TAMED, size=2048, pad=True,
        target_crs="auto", resample_alg="cubic",
    )
    times = []
    for i in range(runs + 1):  # first run is warmup (jit compile)
        t0 = time.perf_counter()
        api.process_safe_to_path(base, out, params, fast=True)
        dt = (time.perf_counter() - t0) * 1000.0
        if i > 0:
            times.append(dt)
    return {
        "p50_ms": float(np.percentile(times, 50)),
        "times_ms": [round(t, 1) for t in times],
        "config": "disk 400MP dual-pol SAFE -> auto-UTM warp (cubic, TPS "
                  "from GCPs) -> 2048 tamed synRGB JPEG (--fast), pad",
    }


def run_breakdown_warp() -> dict:
    """Stage composition of the with-warp headline, same conventions as
    run_breakdown: host stages are min-of-reps in clean subprocesses,
    device stages rep-differenced inside one jit, transfers replaced by the
    PCIe allowance in bench.py's composition."""
    import jax
    import jax.numpy as jnp

    from sarpro_tpu.core import fused
    from sarpro_tpu.io.warp import _warp_sample_block
    from sarpro_tpu.ops.kernels import use_pallas
    from sarpro_tpu.ops.warp_kernel import warp_sample_tiled
    from sarpro_tpu.types import AutoscaleStrategy

    base = ensure_fullsize_safe()
    # band 1 = VV (copol), band 2 = VH — the multiband pipeline's order
    paths = sorted((base / "measurement").glob("*.tiff"),
                   key=lambda p: 0 if "-vv-" in p.name else 1)
    stage_dir = DATA / "stages"
    stage_dir.mkdir(exist_ok=True)

    host = _run_host_stage(_WARP_HOST_STAGE_SNIPPET.format(
        repo=str(REPO), base=str(base), paths=[str(p) for p in paths],
        out=str(stage_dir)))
    mids = [np.load(stage_dir / f"warpmid_{p.name}.npy") for p in paths]
    maps = [np.load(stage_dir / f"warpmap_{p.name}.npy") for p in paths]
    dev = [jnp.asarray(m) for m in mids]
    for d in dev:
        np.asarray(d[0, 0])  # force the ship before timing anything

    out_size = 2048  # target_size -ts sizing: square source -> 2048x2048

    def warp_dev(m, map_xy):
        """The production sampler (Pallas tiled; XLA fallback) — callable
        inside a jit: planning is host numpy at trace time."""
        w = None
        if use_pallas():
            w = warp_sample_tiled(m, map_xy[0], map_xy[1], out_size,
                                  out_size, "cubic")
        if w is None:
            w = _warp_sample_block(
                m, jnp.asarray(map_xy[0], jnp.float32),
                jnp.asarray(map_xy[1], jnp.float32),
                out_size, out_size, "cubic", jnp.int32(0), out_size)
        return w

    def t(fn):
        t0 = time.perf_counter()
        r = fn()
        return (time.perf_counter() - t0) * 1000.0, r

    def reps_runner(r, make):
        @jax.jit
        def run(a, b):
            acc = jnp.int32(0)
            for i in range(r):
                acc = acc + make(a + i, b + i)
            return acc
        run(dev[0], dev[1])  # compile
        return lambda: int(np.asarray(run(dev[0], dev[1])))

    def rep_diff(make):
        one = reps_runner(1, make)
        many = reps_runner(6, make)
        t1 = min(t(one)[0] for _ in range(3))
        t6 = min(t(many)[0] for _ in range(3))
        return max((t6 - t1) / 5.0, 0.0)

    from sarpro_tpu import _native
    from sarpro_tpu.io.writers.jpeg import preferred_synrgb_layout

    layout = "dct" if _native.available() else preferred_synrgb_layout()
    strat = AutoscaleStrategy.TAMED

    def _stage(x, map_xy, copol):
        return fused.synrgb_band_stage(
            warp_dev(x, map_xy), strategy=strat, copol=copol,
            target_size=out_size, pad=True)

    # full post-read device chain: warp-sample both bands + tamed band
    # stages + suppressed combine + JPEG front-end
    full_ms = rep_diff(lambda a, b: jnp.max(fused.synrgb_combine_stage(
        _stage(a, maps[0], True), _stage(b, maps[1], False), strategy=strat,
        suppressed=None, channel_order=layout).astype(jnp.int32)))
    # band 1's share (hidden under band 2's disk read by the overlapped
    # fast path — load_pair dispatches it from the loader thread)
    stage1_ms = rep_diff(
        lambda a, b: _stage(a, maps[0], True)[0, 0].astype(jnp.int32))
    tail_ms = max(full_ms - stage1_ms, 0.0)

    out = fused.synrgb_combine_stage(
        _stage(dev[0], maps[0], True), _stage(dev[1], maps[1], False),
        strategy=strat, suppressed=None, channel_order=layout)
    _ = int(np.asarray(out.ravel()[0]))
    npy = stage_dir / "synrgb_warp_out.npy"
    np.save(npy, np.asarray(out))
    write = _run_host_stage(_JPEG_STAGE_SNIPPET.format(
        repo=str(REPO), npy=str(npy), jpg=str(DATA / "bd_warp.jpg"),
        layout=layout))
    # two more spaced read windows (host DRAM phases — see run_breakdown)
    hosts = [host] + [
        _run_host_stage(_WARP_HOST_STAGE_SNIPPET.format(
            repo=str(REPO), base=str(base), paths=[str(p) for p in paths],
            out=str(stage_dir)), settle_s=4.0)
        for _ in range(2)]
    best = min(hosts, key=lambda h: h["read_ms"])
    mins = [h["read_ms"] for h in hosts]
    return {
        "read_reduce_ms": round(best["read_ms"], 1),
        "host_stage_stats": {
            "read_reduce": {
                "min_ms": round(min(mins), 1),
                "p50_ms": round(best["read_p50_ms"], 1),
                "windows": len(hosts),
                "reps_per_window": best.get("reps", 5),
                "window_mins_ms": [round(m, 1) for m in mins],
                "spread_pct": round(
                    100.0 * (max(mins) - min(mins)) / min(mins), 1),
            },
        },
        "auto_crs_ms": round(min(h["auto_crs_ms"] for h in hosts), 1),
        "warp_plan_ms": round(min(h["plan_ms"] for h in hosts), 1),
        "target_crs": best["target"],
        "mid_dims": best["mid"],
        "device_full_chain_ms": round(full_ms, 1),
        "device_band1_hidden_ms": round(stage1_ms, 1),
        "device_tail_ms": round(tail_ms, 1),
        "jpeg_write_ms": round(write["ms"], 1),
        "jpeg_layout": layout,
        "note": "read = dual-band host box reduce to the warp's ~1.25x-"
                "output intermediate (same single source traversal as the "
                "no-warp stage); plan = per-band TPS fit + inverse-mapping "
                "grid; device chain = tiled Pallas warp sample x2 + tamed "
                "band stages + suppressed synRGB + JPEG front-end, "
                "rep-differenced in one jit; the overlapped fast path hides "
                "band 1's chain under band 2's disk read",
    }


if __name__ == "__main__":
    res = {"e2e": run_e2e(), "breakdown": run_breakdown(),
           "e2e_warp": run_e2e_warp(), "breakdown_warp": run_breakdown_warp()}
    print(json.dumps(res, indent=2))
