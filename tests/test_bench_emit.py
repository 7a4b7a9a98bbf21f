"""Regression tests for bench.py's graded-output contract.

Round 4's bench printed ONE ~2.4 kB JSON line; the driver captures only the
last 2000 characters of stdout, so the line arrived beheaded and
BENCH_r04.json recorded "parsed": null — the graded artifact of the best
round so far was machine-unreadable (VERDICT r4 weak #1).

These tests pin the new contract implemented by bench.emit_result():
the FINAL stdout line is a compact, parseable record under
bench.FINAL_LINE_BUDGET (< the driver's 2000-char tail), and the full
extras land on an earlier line plus a BENCH_extras.json sidecar.
"""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parents[1]))
import bench  # noqa: E402


def _round4_sized_result():
    """A result whose extras match round 4's real payload size (~2.4 kB
    serialized) — the exact shape that overflowed the tail capture."""
    extras = {
        "vs_baseline_meaning": "peak frames/s over round-1 close "
        "(693135 f/s); reference publishes no numbers",
        "headline_batch": 256,
        "train_step_time_ms": 16.65,
        "train_batch": 32,
        "train_frames_per_batch": 20480,
        "mfu": 0.6037,
        "mfu_b128": 0.7004,
        "mfu_b192": 0.7046,
        "mfu_b256": 0.7111,
        "chip": "TPU v5 lite",
        "large_mfu": 0.9166,
        "safe_mode": False,
        "mas_grid_ms": {
            f"b{b}_{tx}x{ty}": {
                "scan_p50_ms": 1.2, "scan_p95_ms": 1.3,
                "pallas_p50_ms": 0.3, "pallas_p95_ms": 0.4,
            }
            for b, tx, ty in [(8, 64, 256), (32, 128, 640), (8, 384, 2600)]
        },
        "batch_sweep_frames_per_sec": {
            str(b): 1.4e6 for b in (32, 128, 192, 256)
        },
        "breakdown_ms": {
            "encoder_fwd": 1.0, "flow_decoder_fwd": 3.6, "mas_scan": 1.234,
            "full_fwd_with_losses": 4.88, "bwd_plus_optimizer": 11.78,
        },
        # pad to round-4 scale so the test exercises the real overflow size
        **{f"aux_metric_{i}": round(i * 1.0001, 4) for i in range(40)},
    }
    return {
        "metric": "train_mel_frames_per_sec_per_chip",
        "value": 1448716.3,
        "unit": "frames/sec",
        "vs_baseline": 2.09,
        "extras": extras,
    }


def _driver_tail_parse(stdout_text, tail_chars=2000):
    """Mimic the driver: keep the last `tail_chars` characters, parse the
    final non-empty line as JSON (None on failure)."""
    tail = stdout_text[-tail_chars:]
    lines = [ln for ln in tail.splitlines() if ln.strip()]
    if not lines:
        return None
    try:
        return json.loads(lines[-1])
    except json.JSONDecodeError:
        return None


def test_final_line_fits_budget_and_parses(tmp_path, capsys):
    result = _round4_sized_result()
    assert len(json.dumps(result)) > 2000  # the failure-triggering size
    bench.emit_result(result, sidecar_dir=str(tmp_path))
    out = capsys.readouterr().out
    final = out.splitlines()[-1]
    assert len(final) < bench.FINAL_LINE_BUDGET
    parsed = json.loads(final)
    assert parsed["metric"] == "train_mel_frames_per_sec_per_chip"
    assert parsed["value"] == 1448716.3
    assert parsed["unit"] == "frames/sec"
    assert parsed["vs_baseline"] == 2.09
    assert parsed["extras"]["headline_batch"] == 256


def test_driver_tail_capture_recovers_headline(tmp_path, capsys):
    """End-to-end against the real failure mode: 2000-char tail of the
    FULL stdout (both lines) must still parse to the headline record."""
    bench.emit_result(_round4_sized_result(), sidecar_dir=str(tmp_path))
    out = capsys.readouterr().out
    parsed = _driver_tail_parse(out)
    assert parsed is not None, "driver tail capture must parse"
    assert parsed["value"] == 1448716.3
    assert parsed["vs_baseline"] == 2.09


def test_sidecar_holds_full_extras(tmp_path, capsys):
    result = _round4_sized_result()
    bench.emit_result(result, sidecar_dir=str(tmp_path))
    capsys.readouterr()
    sidecar = json.loads((tmp_path / "BENCH_extras.json").read_text())
    assert sidecar == result  # nothing lost to compaction


def test_full_extras_still_on_earlier_stdout_line(tmp_path, capsys):
    """The first stdout line carries the complete result, so a human log
    reader (or a generous capture) needs no sidecar."""
    result = _round4_sized_result()
    bench.emit_result(result, sidecar_dir=str(tmp_path))
    lines = [
        ln for ln in capsys.readouterr().out.splitlines() if ln.strip()
    ]
    assert json.loads(lines[0]) == result


def test_oversized_compact_extras_degrade_to_headline_only(
    tmp_path, capsys
):
    """Even if every promoted extra were huge, the final line never
    exceeds the budget — extras drop before the headline does."""
    result = _round4_sized_result()
    result["extras"]["chip"] = "x" * 2000  # promoted key, absurd value
    bench.emit_result(result, sidecar_dir=str(tmp_path))
    final = capsys.readouterr().out.splitlines()[-1]
    assert len(final) < bench.FINAL_LINE_BUDGET
    parsed = json.loads(final)
    assert parsed["value"] == 1448716.3
    assert parsed["extras"] == {"full_extras": "BENCH_extras.json"}


def test_sidecar_write_failure_never_kills_graded_line(tmp_path, capsys):
    bench.emit_result(
        _round4_sized_result(),
        sidecar_dir=str(tmp_path / "nonexistent" / "dir"),
    )
    out = capsys.readouterr().out
    parsed = json.loads(out.splitlines()[-1])
    assert parsed["value"] == 1448716.3
