#!/usr/bin/env bash
# Static checks (reference scripts/check-code.sh:21-26 gauntlet equivalent:
# flake8 + pylint + mypy + black + isort).  This environment ships none of
# those tools, so the always-on floor is byte-compilation, tab/indent
# hygiene, and the fast non-device tests; each gauntlet tool lights up
# automatically wherever it IS installed (configs: setup.cfg, mypy.ini,
# pylintrc, [tool.black]/[tool.isort] in pyproject.toml).
set -e
cd "$(dirname "$0")/.."

PY_TARGETS="glow_tts_train_tpu bench.py __graft_entry__.py"

python -m compileall -q $PY_TARGETS scripts tests
python -m tabnanny glow_tts_train_tpu tests

maybe() { # maybe <module> <cmd...>
    local mod="$1"; shift
    if python -c "import $mod" >/dev/null 2>&1; then
        echo "+ $*"
        "$@"
    else
        echo "check-code: $mod not installed, skipping"
    fi
}

maybe flake8 python -m flake8 $PY_TARGETS
maybe pylint python -m pylint glow_tts_train_tpu
maybe mypy python -m mypy glow_tts_train_tpu
maybe black python -m black --check $PY_TARGETS tests
maybe isort python -m isort --check-only $PY_TARGETS tests

python -m pytest tests/test_config.py tests/test_data.py tests/test_optimize.py -q
echo "check-code: OK"
