"""ctypes bridge to the native C++ MAS kernel (native/mas.cpp).

The reference's only native component is the Cython MAS extension
(monotonic_align/core.pyx, built in-place by scripts/create-venv.sh:36-40).
Our equivalent is a plain C++/OpenMP shared library compiled on demand with
g++ — no Cython, no build step at install time.  It exists for CPU-parity
testing and host-side tooling; the TPU training path uses ops/mas.py.
"""

import ctypes
import logging
import subprocess
import typing
from pathlib import Path

import numpy as np

_LOGGER = logging.getLogger("glow_tts_train_tpu.mas_native")

_REPO_ROOT = Path(__file__).resolve().parent.parent.parent
_SRC = _REPO_ROOT / "native" / "mas.cpp"
_LIB = _REPO_ROOT / "native" / "build" / "libmas.so"

_lib_handle: typing.Optional[ctypes.CDLL] = None


def _build() -> Path:
    _LIB.parent.mkdir(parents=True, exist_ok=True)
    cmd = [
        "g++",
        "-O3",
        "-fopenmp",
        "-shared",
        "-fPIC",
        str(_SRC),
        "-o",
        str(_LIB),
    ]
    _LOGGER.info("Building native MAS kernel: %s", " ".join(cmd))
    subprocess.run(cmd, check=True, capture_output=True)
    return _LIB


def load_library() -> ctypes.CDLL:
    global _lib_handle
    if _lib_handle is not None:
        return _lib_handle
    if not _LIB.exists() or _LIB.stat().st_mtime < _SRC.stat().st_mtime:
        _build()
    lib = ctypes.CDLL(str(_LIB))
    lib.maximum_path_batch.restype = None
    lib.maximum_path_batch.argtypes = [
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_float,
    ]
    _lib_handle = lib
    return lib


def available() -> bool:
    try:
        load_library()
        return True
    except (OSError, subprocess.CalledProcessError, FileNotFoundError):
        return False


def maximum_path_cpp(
    logp: np.ndarray, mask: np.ndarray, max_neg_val: float = -1e9
) -> np.ndarray:
    """Batch MAS on the host.  logp, mask: [b, t_x, t_y]; returns the 0/1
    path with logp's dtype (API parity with monotonic_align/__init__.py:6-21)."""
    lib = load_library()
    values = np.ascontiguousarray(logp * mask, dtype=np.float32)
    paths = np.zeros_like(values, dtype=np.int32)
    t_xs = np.ascontiguousarray(mask.sum(1)[:, 0], dtype=np.int32)
    t_ys = np.ascontiguousarray(mask.sum(2)[:, 0], dtype=np.int32)
    b, t_x_max, t_y_max = values.shape
    lib.maximum_path_batch(
        paths.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        values.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        t_xs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        t_ys.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        b,
        t_x_max,
        t_y_max,
        max_neg_val,
    )
    return (paths * mask).astype(logp.dtype)
