"""bench.py retry supervisor: hang/failure handling without a device.

The supervisor re-execs bench.py whole-process because jax caches a failed
plugin init for the process lifetime; these tests stub the child process to
exercise the ladder logic itself (timeout handling, BENCH_SAFE pinning on
the final attempts, stdout pass-through) on any platform.

Round-4 additions (VERDICT r3 item 2): failure CLASSIFICATION.  The round-3
graded bench failed with a deterministic tracer ValueError, and the
supervisor slept through its whole 0->3600 s ladder retrying it — rc=124,
no artifact.  Deterministic failures must now escalate to BENCH_SAFE ->
BENCH_MINIMAL with NO sleeping; the ladder is reserved for transient
backend/tunnel failures.
"""

import subprocess
import sys
import types

import pytest

sys.path.insert(0, str(__import__("pathlib").Path(__file__).parents[1]))
import bench  # noqa: E402


def _completed(rc, stdout="", stderr=""):
    return subprocess.CompletedProcess(
        args=[], returncode=rc, stdout=stdout, stderr=stderr
    )


def test_supervisor_retries_hang_then_failure_then_success(
    monkeypatch, capsys
):
    calls = []

    def fake_run(cmd, env=None, timeout=None, **kwargs):
        calls.append({"env": dict(env), "timeout": timeout})
        if len(calls) == 1:
            raise subprocess.TimeoutExpired(cmd=cmd, timeout=timeout)
        if len(calls) == 2:
            return _completed(1)  # no traceback in stderr -> transient
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

    def fake_run(cmd, env=None, timeout=None, **kwargs):
        calls.append(dict(env))
        return _completed(1)  # transient every time

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


# --- failure classification (round 4) ---------------------------------

_TRACER_ERROR = """\
bench_train: compiling + timing...
Traceback (most recent call last):
  File "/root/repo/bench.py", line 496, in <module>
    main()
  File "/root/repo/bench.py", line 100, in body
    st, metrics = step_fn(st, batch, jax.random.fold_in(rng, i))
ValueError: `compiler_options` can only be passed to top-level `jax.jit`.
--------------------
For simplicity, JAX has removed its internal frames from the traceback.
"""

_BACKEND_ERROR = """\
WARNING: Platform 'axon' is experimental
Traceback (most recent call last):
  File "/root/repo/bench.py", line 40, in measure_rpc_baseline
    float(triv(z))
jaxlib.xla_extension.XlaRuntimeError: UNAVAILABLE: failed to connect
"""


def test_classify_deterministic_tracer_error():
    assert bench.classify_failure(1, _TRACER_ERROR) == "deterministic"


def test_classify_backend_error_is_transient():
    assert bench.classify_failure(1, _BACKEND_ERROR) == "transient"


def test_classify_hang_and_empty_are_transient():
    assert bench.classify_failure(None, _TRACER_ERROR) == "transient"
    assert bench.classify_failure(1, "") == "transient"
    assert bench.classify_failure(1, None) == "transient"
    # rc!=0 without a traceback (e.g. SIGKILL by the OOM killer)
    assert bench.classify_failure(-9, "some log line\n") == "transient"


def test_classify_last_exception_wins():
    # a transient error whose *cause chain* mentions ValueError earlier:
    # the terminal (last) exception line decides
    text = (
        "Traceback (most recent call last):\n"
        '  File "x.py", line 1, in f\n'
        "ValueError: bad\n\n"
        "During handling of the above exception, another exception "
        "occurred:\n\n"
        "Traceback (most recent call last):\n"
        '  File "x.py", line 2, in g\n'
        "jaxlib.xla_extension.XlaRuntimeError: UNAVAILABLE: backend died\n"
    )
    assert bench.classify_failure(1, text) == "transient"


def test_supervisor_escalates_deterministic_without_sleeping(
    monkeypatch, capsys
):
    """Deterministic failure -> BENCH_SAFE -> BENCH_MINIMAL, zero sleeps.

    This is the exact round-3 failure shape: the full bench raises a tracer
    ValueError on every attempt.  The supervisor must reach a successful
    BENCH_MINIMAL run in three attempts with no time.sleep calls, instead
    of burning hours on the transient ladder.
    """
    calls = []

    def fake_run(cmd, env=None, timeout=None, **kwargs):
        calls.append(dict(env))
        if "BENCH_MINIMAL" in env:
            return _completed(0, '{"metric": "m", "value": 2}\n')
        return _completed(1, stderr=_TRACER_ERROR)

    sleeps = []
    monkeypatch.setattr(subprocess, "run", fake_run)
    monkeypatch.setattr(
        bench, "time", types.SimpleNamespace(sleep=sleeps.append)
    )

    assert bench._supervised() == 0
    assert '"metric": "m"' in capsys.readouterr().out
    assert sleeps == []  # never slept
    assert len(calls) == 3
    assert "BENCH_SAFE" not in calls[0]
    assert calls[1].get("BENCH_SAFE") == "1"
    assert "BENCH_MINIMAL" not in calls[1]
    assert calls[2].get("BENCH_MINIMAL") == "1"


def test_supervisor_gives_up_fast_when_even_minimal_is_deterministic(
    monkeypatch,
):
    calls = []

    def fake_run(cmd, env=None, timeout=None, **kwargs):
        calls.append(dict(env))
        return _completed(1, stderr=_TRACER_ERROR)

    sleeps = []
    monkeypatch.setattr(subprocess, "run", fake_run)
    monkeypatch.setattr(
        bench, "time", types.SimpleNamespace(sleep=sleeps.append)
    )

    assert bench._supervised() == 1
    assert sleeps == []  # exits in seconds, not hours
    assert len(calls) == 3  # full, SAFE, MINIMAL — then stop


def test_supervisor_forwards_child_stderr(monkeypatch, capsys):
    """Child stderr must reach the parent's stderr so the graded artifact
    tail still carries the diagnostics (BENCH_r03-style postmortems)."""

    def fake_run(cmd, env=None, timeout=None, **kwargs):
        return _completed(
            0, '{"metric": "x", "value": 1}\n', stderr="child progress\n"
        )

    monkeypatch.setattr(subprocess, "run", fake_run)
    monkeypatch.setattr(
        bench, "time", types.SimpleNamespace(sleep=lambda s: None)
    )
    assert bench._supervised() == 0
    captured = capsys.readouterr()
    assert "child progress" in captured.err
