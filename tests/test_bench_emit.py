"""bench.py must emit a BOUNDED headline JSON line as its last stdout line.

Round 3's single unbounded line outgrew the driver's stdout capture window
and the round artifact landed with ``"parsed": null`` (VERDICT r3 item 2).
The contract now: the full result dict goes to bench_detail.json; stdout
gets a compact line (< 1 KB) carrying the headline value plus a fixed,
small set of promoted extras.
"""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import bench


def _reset(monkeypatch, tmp_path):
    monkeypatch.chdir(tmp_path)
    monkeypatch.setattr(bench, "_PRINTED", False)
    partial = {"metric": "vocoder_rtf_1stream_device", "value": 134.0,
               "unit": "x_realtime", "vs_baseline": 6.7, "extra": {}}
    monkeypatch.setattr(bench, "_PARTIAL", partial)
    return partial


def test_emit_line_is_bounded_and_detail_complete(monkeypatch, tmp_path,
                                                  capsys):
    partial = _reset(monkeypatch, tmp_path)
    # Simulate a maximal run: every promoted key present plus hundreds of
    # detail-only fields (far more than round 3 ever emitted).
    for k in bench._HEADLINE_KEYS:
        partial["extra"][k] = 123.456
    for i in range(400):
        partial["extra"][f"some_metric_{i:03d}_with_a_long_name"] = i * 1.5

    bench._emit()
    out = capsys.readouterr().out
    lines = [ln for ln in out.splitlines() if ln.strip()]
    assert len(lines) == 1
    assert len(lines[0]) < 1024, f"headline line is {len(lines[0])} bytes"
    parsed = json.loads(lines[0])
    assert parsed["metric"] == "vocoder_rtf_1stream_device"
    assert parsed["value"] == 134.0
    # Every promoted key made it into the compact line.
    for k in bench._HEADLINE_KEYS:
        assert parsed["extra"][k] == 123.456
    assert parsed["extra"]["detail"] == "bench_detail.json"

    detail = json.loads((tmp_path / "bench_detail.json").read_text())
    assert len(detail["extra"]) == len(partial["extra"])
    assert detail["extra"]["some_metric_399_with_a_long_name"] == 598.5


def test_emit_is_idempotent(monkeypatch, tmp_path, capsys):
    _reset(monkeypatch, tmp_path)
    bench._emit()
    bench._emit()
    out = capsys.readouterr().out
    assert len([ln for ln in out.splitlines() if ln.strip()]) == 1


def test_emit_survives_missing_promoted_keys(monkeypatch, tmp_path, capsys):
    """A partial (signal-killed) run has few extras; the line still parses."""
    _reset(monkeypatch, tmp_path)
    bench._emit()
    parsed = json.loads(capsys.readouterr().out.strip())
    assert parsed["extra"] == {"detail": "bench_detail.json"}
