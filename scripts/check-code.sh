#!/usr/bin/env bash
# Static checks (reference scripts/check-code.sh equivalent).
# The reference runs flake8/pylint/mypy/black/isort; this environment ships
# none of them, so we gate on byte-compilation of every module plus the
# fast non-device test files. Swap in the full lint gauntlet where available.
set -e
cd "$(dirname "$0")/.."
python -m compileall -q glow_tts_train_tpu bench.py __graft_entry__.py
python -m pytest tests/test_config.py tests/test_data.py tests/test_optimize.py -q
echo "check-code: OK"
