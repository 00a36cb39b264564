"""Tests: GUI server API (state, presets, CLI generator, process worker)."""
import json
import threading
import time
import urllib.request

import pytest

import fixtures
from sarpro_tpu.gui.server import make_server
from sarpro_tpu.gui.state import GuiState, generate_cli_command


@pytest.fixture
def server():
    srv = make_server("127.0.0.1", 0)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{port}"
    srv.shutdown()


def _get(base, path):
    with urllib.request.urlopen(base + path, timeout=10) as r:
        return json.loads(r.read())


def _post(base, path, obj):
    req = urllib.request.Request(
        base + path, data=json.dumps(obj).encode(), method="POST"
    )
    with urllib.request.urlopen(req, timeout=30) as r:
        return json.loads(r.read())


def test_index_and_state(server):
    with urllib.request.urlopen(server + "/", timeout=10) as r:
        html = r.read().decode()
    assert "sarproUI" in html and "Autoscale" in html
    state = _get(server, "/api/state")
    assert state["params"]["autoscale"] == "Clahe"
    assert state["running"] is False


def test_state_update_and_cli_generator(server):
    _post(server, "/api/state", {
        "mode": "batch", "input_dir": "/d/in", "output_dir": "/d/out",
        "prefetch": 3,
        "params": {"format": "JPEG", "polarization": "multiband",
                   "autoscale": "tamed", "size": 2048, "pad": True,
                   "target_crs": "auto"},
    })
    cmd = _get(server, "/api/cli")["command"]
    assert "--input-dir /d/in" in cmd
    assert "-f jpeg" in cmd
    assert "--polarization multiband" in cmd
    assert "--autoscale tamed" in cmd
    assert "--size 2048" in cmd and "--pad" in cmd
    assert "--target-crs auto" in cmd and "--prefetch 3" in cmd


def test_preset_roundtrip(server, tmp_path):
    p = tmp_path / "x.sarpro"
    _post(server, "/api/state", {"params": {"autoscale": "robust", "size": 512}})
    _post(server, "/api/preset/save", {"path": str(p)})
    text = p.read_text()
    assert text.startswith("//")  # commented JSON header (models.rs:208-341)
    _post(server, "/api/state", {"params": {"autoscale": "clahe", "size": None}})
    loaded = _post(server, "/api/preset/load", {"path": str(p)})
    assert loaded["params"]["autoscale"] == "Robust"
    assert loaded["params"]["size"] == 512


def test_process_single_file(server, tmp_path):
    base = fixtures.make_safe(tmp_path)
    out = tmp_path / "gui_out.tiff"
    _post(server, "/api/state", {
        "mode": "single", "input_path": str(base), "output_path": str(out),
        "params": {"autoscale": "standard", "size": 32},
    })
    assert _post(server, "/api/process", {})["started"]
    for _ in range(600):
        s = _get(server, "/api/state")
        if not s["running"] and s["last_result"]:
            break
        time.sleep(0.1)
    assert s["last_result"]["ok"], s["last_result"]
    assert out.exists()
    # logs flowed through the ring buffer
    logs = _get(server, "/api/logs")
    assert isinstance(logs, list)


def test_cli_generator_defaults():
    state = GuiState()
    cmd = generate_cli_command(state)
    assert cmd.startswith("sarpro -i")
    assert "--autoscale clahe" in cmd
    assert "--bit-depth" not in cmd  # u8 default omitted
