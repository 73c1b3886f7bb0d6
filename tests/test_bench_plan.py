"""Unit tests for bench.py's starvation-proof phase planner (_Plan).

The planner is the round-5 answer to two driver artifacts in a row
under-reporting the framework (VERDICT r04 item 1): every recorded
metric family is a MUST phase, cheap families run first, phase costs
are re-estimated in-run, and a phase failure or a hard wall degrades
to a labeled-partial JSON line instead of no line at all. These tests
pin that contract without touching a device: _Plan is pure host logic.
"""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from bench import _Plan  # noqa: E402


def _notes():
    msgs: list[str] = []
    return msgs, msgs.append


def test_must_phase_failure_returns_default_and_labels_artifact():
    """A MUST phase that dies after its own retries must not take the
    whole run (and the single JSON line) with it."""
    msgs, note = _notes()
    plan = _Plan(budget_s=100.0, hard_wall_s=1000.0, note=note)

    def boom():
        raise RuntimeError("tunnel fell over")

    out = plan.run("serving_window", boom, est_s=5, must=True,
                   default={"serving_delivered_fps": 0.0})
    assert out == {"serving_delivered_fps": 0.0}
    assert "serving_window:failed" in plan.skipped
    assert "serving_window" in plan.phase_s  # cost still recorded
    assert any("FAILED" in m for m in msgs)

    # the run continues: later phases still execute
    assert plan.run("tiled_core", lambda: 7, est_s=5, must=True) == 7


def test_must_phase_failure_without_default_propagates():
    """No default means nothing downstream can work (detector_init):
    the exception must surface rather than be silently swallowed."""
    _, note = _notes()
    plan = _Plan(budget_s=100.0, hard_wall_s=1000.0, note=note)
    with pytest.raises(RuntimeError):
        plan.run("detector_init", lambda: (_ for _ in ()).throw(
            RuntimeError("no device")), est_s=5, must=True)


def test_optional_phase_skipped_when_musts_reserve_budget():
    """Declared-but-unrun MUST phases reserve budget so an optional
    phase cannot starve them (the r04 failure mode: the latency preset
    ate 210 s and every later family recorded 0.0)."""
    msgs, note = _notes()
    plan = _Plan(budget_s=100.0, hard_wall_s=1000.0, note=note)
    plan.declare_musts(serving_window=60, tiled_core=35)
    # optional est 20 but 95 of the 100 is owed to musts -> skip
    out = plan.run("lossless_depth2", lambda: 1, est_s=20,
                   default="skipped")
    assert out == "skipped"
    assert "lossless_depth2" in plan.skipped
    assert any("skipped" in m for m in msgs)

    # running a MUST phase releases its reservation
    plan.run("serving_window", lambda: 1, est_s=60, must=True)
    assert plan.reserve() == pytest.approx(35 * plan.scale)


def test_must_phase_runs_even_when_budget_exhausted():
    """MUST phases ignore the soft budget (they are the metric
    families the driver records); only the hard wall stops them."""
    _, note = _notes()
    plan = _Plan(budget_s=0.0, hard_wall_s=1000.0, note=note)
    assert plan.remaining() <= 0.0
    assert plan.run("anchor", lambda: 42, est_s=30, must=True) == 42


def test_hard_wall_skips_even_must_phases():
    """Past the hard wall a labeled-partial line beats a driver-timeout
    kill: even MUST phases are skipped (with the default)."""
    msgs, note = _notes()
    plan = _Plan(budget_s=500.0, hard_wall_s=10.0, note=note)
    out = plan.run("latency_preset", lambda: 1, est_s=5, must=True,
                   default={"p50": -1.0})
    assert out == {"p50": -1.0}
    assert "latency_preset" in plan.skipped
    assert any("hard wall" in m for m in msgs)


def test_scale_adapts_to_observed_cost():
    """Observed phase cost re-scales later estimates (a sick tunnel
    inflates them instead of surprising them), bounded to [0.5, 6]."""
    _, note = _notes()
    plan = _Plan(budget_s=100.0, hard_wall_s=1000.0, note=note)
    # phase declared at 1e-9 s but takes real time -> ratio >> 1,
    # scale rises (capped at 6)
    import time as _t
    plan.run("pipeline", lambda: _t.sleep(0.002), est_s=1e-9,
             must=True, default=0)
    assert plan.scale > 1.0
    assert plan.scale <= 6.0


def test_sigterm_emits_partial_json_line(tmp_path):
    """If the driver's external timeout SIGTERMs the bench mid-phase
    (observed once: killed during the final optional phase, the whole
    run's record lost), the signal handler must emit the snapshot of
    everything measured so far as the one JSON line and exit 0."""
    import json
    import subprocess

    script = tmp_path / "drive.py"
    script.write_text(
        "import os, signal, sys\n"
        f"sys.path.insert(0, {str(Path(__file__).parents[1])!r})\n"
        "import bench\n"
        "bench._PARTIAL = {'metric': 'm', 'value': 3.5, 'unit': 'f/s',\n"
        "                  'vs_baseline': 2.0, 'partial_at': 'tiled',\n"
        "                  'phase_s': {'anchor': 1.0},\n"
        "                  'skipped_phases': []}\n"
        "signal.signal(signal.SIGTERM, bench._emit_partial_and_exit)\n"
        "os.kill(os.getpid(), signal.SIGTERM)\n"
        "signal.pause()\n")
    proc = subprocess.run([sys.executable, str(script)],
                          capture_output=True, text=True, timeout=60)
    assert proc.returncode == 0
    lines = [ln for ln in proc.stdout.splitlines() if ln.strip()]
    assert len(lines) == 1
    row = json.loads(lines[0])
    assert row["partial"] is True
    assert row["value"] == 3.5 and row["vs_baseline"] == 2.0
    assert row["partial_at"] == "tiled"
    assert "killed_by" in row


def test_append_anchor_never_costs_the_json_line(tmp_path, monkeypatch):
    """_append_anchor is best-effort by contract: ANY docs failure
    (here an undecodable PERFORMANCE.md -> UnicodeDecodeError, which is
    not an OSError) must be swallowed, because it runs after all
    measurement and before the single JSON line is printed."""
    from bench import _append_anchor

    docs = tmp_path / "docs"
    docs.mkdir()
    (docs / "PERFORMANCE.md").write_bytes(
        b"\xff\xfe garbage <!-- anchor-rows:end -->")
    monkeypatch.setattr("bench.os.path.dirname",
                        lambda p: str(tmp_path))
    _append_anchor({"latch_s": 1.0, "value": 2.0})  # must not raise
    # the jsonl row (written before the doc read) still landed
    assert (docs / "anchors.jsonl").read_text().strip()
