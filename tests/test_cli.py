"""CLI tests: flag parity, size parsing, single + batch flows."""
import numpy as np
import pytest
from PIL import Image

import fixtures
from sarpro_tpu import cli
from sarpro_tpu.io.tiffio import TiffReader


def test_parser_defaults():
    args = cli.build_parser().parse_args([])
    assert args.format == "tiff"
    assert args.bit_depth == "u8"
    assert args.polarization == "vv"
    assert args.autoscale == "clahe"
    assert args.size == "original"
    assert args.synrgb_mode == "default"
    assert not args.pad and not args.batch and not args.log


def test_parser_all_polarizations():
    for pol in ("vv", "vh", "hh", "hv", "multiband", "sum", "diff", "ratio",
                "n-diff", "log-ratio"):
        args = cli.build_parser().parse_args(["--polarization", pol])
        assert args.polarization == pol


def test_size_parsing():
    assert cli._parse_size("original") is None
    assert cli._parse_size("1536") == 1536
    with pytest.raises(Exception):
        cli._parse_size("0")
    with pytest.raises(Exception):
        cli._parse_size("abc")


def test_cli_single_file(tmp_path):
    base = fixtures.make_safe(tmp_path)
    out = tmp_path / "o.tiff"
    rc = cli.run([
        "-i", str(base), "-o", str(out),
        "--autoscale", "standard", "--size", "48",
    ])
    assert rc == 0
    r = TiffReader(out)
    assert (r.width, r.height) == (48, 36)
    assert r.dtype == np.dtype("<u1")


def test_cli_batch(tmp_path, capsys):
    indir = tmp_path / "in"
    indir.mkdir()
    fixtures.make_safe(indir, name="p1.SAFE", seed=5)
    fixtures.make_safe(indir, name="slc.SAFE", product_type="SLC", seed=6)
    outdir = tmp_path / "out"
    rc = cli.run([
        "--input-dir", str(indir), "--output-dir", str(outdir),
        "-f", "jpeg", "--polarization", "multiband",
        "--autoscale", "tamed", "--size", "32",
    ])
    assert rc == 0
    captured = capsys.readouterr()
    assert "Processed: 1" in captured.out
    assert "Skipped: 1" in captured.out
    im = Image.open(outdir / "p1.SAFE.jpg")
    assert im.mode == "RGB"


def test_cli_missing_args(tmp_path, capsys):
    assert cli.run([]) == 1
    assert "Missing required argument: --input" in capsys.readouterr().err
    assert cli.run(["--batch"]) == 1
    assert "--input-dir" in capsys.readouterr().err


def test_cli_every_polarization_end_to_end(tmp_path):
    """Every CLI polarization choice produces a valid output file."""
    base = fixtures.make_safe(tmp_path)
    for pol in ("vv", "vh", "multiband", "sum", "diff", "ratio",
                "n-diff", "log-ratio"):
        out = tmp_path / f"o_{pol}.tiff"
        rc = cli.run([
            "-i", str(base), "-o", str(out),
            "--polarization", pol, "--autoscale", "robust", "--size", "32",
        ])
        assert rc == 0, pol
        r = TiffReader(out)
        assert r.width == 32 and r.height == 24, pol
        md = r.gdal_metadata()
        assert "POLARIZATIONS" in md, pol


def test_cli_every_autoscale_end_to_end(tmp_path):
    from PIL import Image

    base = fixtures.make_safe(tmp_path)
    for strat in ("standard", "robust", "adaptive", "equalized", "clahe",
                  "tamed", "default"):
        out = tmp_path / f"s_{strat}.jpg"
        rc = cli.run([
            "-i", str(base), "-o", str(out), "-f", "jpeg",
            "--autoscale", strat, "--size", "32",
        ])
        assert rc == 0, strat
        assert Image.open(out).size == (32, 24), strat
