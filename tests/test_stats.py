"""Golden tests: histogram statistics & percentile inversion vs the f64 oracle."""
import numpy as np
import pytest

import oracle
from sarpro_tpu.core import pipeline, stats


def sar_like(rng, shape=(64, 96), zeros_frac=0.05):
    """Synthetic SAR intensity: lognormal DN-like values with invalid zeros."""
    x = rng.lognormal(mean=5.0, sigma=1.2, size=shape).astype(np.float32)
    mask = rng.random(shape) < zeros_frac
    x[mask] = 0.0
    return x


def test_percentile_inversion_matches_oracle_exactly(rng):
    """Same histogram in -> identical percentile values out (pure host math)."""
    hist = rng.integers(0, 50, size=stats.NUM_BINS).astype(np.uint64)
    count = int(hist.sum())
    mn, mx = -43.7, 12.9
    for p in (0.01, 0.02, 0.05, 0.10, 0.25, 0.5, 0.75, 0.90, 0.95, 0.98, 0.99):
        got = stats.estimate_percentile(hist, count, mn, mx, p)
        # oracle-style walk
        span = mx - mn
        target = min(int(np.floor(p * count)), count - 1)
        cum = 0
        want = mx
        for b in range(stats.NUM_BINS):
            h = int(hist[b])
            if target < cum + h:
                within = max(target - cum, 0)
                frac = within / h if h > 0 else 0.0
                bw = span / stats.NUM_BINS
                want = mn + b * bw + frac * bw
                break
            cum += h
        assert got == pytest.approx(want, abs=0.0), p


def test_device_stats_match_oracle_within_half_bin(rng):
    x = sar_like(rng)
    db_o, valid_o = oracle.db_and_mask(x)
    s_o = oracle.histogram_stats(db_o, valid_o)

    _db, _mask, s = pipeline.compute_db_and_stats(x)
    assert s.valid_count == s_o["valid_count"]
    assert s.min_db == pytest.approx(s_o["min_db"], abs=1e-4)
    assert s.max_db == pytest.approx(s_o["max_db"], abs=1e-4)
    assert s.mean_db == pytest.approx(s_o["mean_db"], abs=1e-3)
    assert s.std_db == pytest.approx(s_o["std_db"], abs=1e-3)
    half_bin = (s_o["max_db"] - s_o["min_db"]) / stats.NUM_BINS
    for name in ("median_db", "p01", "p02", "p05", "p10", "p25",
                 "p75", "p90", "p95", "p98", "p99"):
        assert getattr(s, name) == pytest.approx(s_o[name], abs=half_bin + 1e-6), name


def test_empty_and_degenerate():
    x = np.zeros((8, 8), np.float32)  # all below the -50 dB validity cut
    _db, _mask, s = pipeline.compute_db_and_stats(x)
    assert s.valid_count == 0 and s.min_db == 0.0 and s.p99 == 0.0

    x = np.full((8, 8), 100.0, np.float32)  # constant valid value
    _db, _mask, s = pipeline.compute_db_and_stats(x)
    assert s.valid_count == 64
    assert s.min_db == pytest.approx(20.0, abs=1e-3)
    assert s.p01 == s.min_db and s.p99 == s.max_db and s.median_db == s.min_db


def test_host_stats_path_matches_oracle(rng):
    """compute_histogram_stats_host is itself bit-faithful to the oracle."""
    x = sar_like(rng, (40, 40))
    db_o, valid_o = oracle.db_and_mask(x)
    s_o = oracle.histogram_stats(db_o, valid_o)
    s = stats.compute_histogram_stats_host(db_o, valid_o)
    for name, want in s_o.items():
        got = getattr(s, name)
        assert got == pytest.approx(want, abs=1e-12), name
