#!/usr/bin/env bash
# Auto-format the package in place (reference scripts/format-code.sh
# equivalent).  black/isort are optional in minimal environments; each
# formatter runs only where installed, and the script says what it skipped.
set -e

this_dir="$( cd "$( dirname "$0" )" && pwd )"
src_dir="$(realpath "${this_dir}/..")"
export PYTHONPATH="${src_dir}"

targets=("${src_dir}/glow_tts_train_tpu" "${src_dir}/tests" "${src_dir}/bench.py")

ran_any=0
if command -v black >/dev/null 2>&1; then
    black "${targets[@]}"
    ran_any=1
else
    echo "skip: black not installed"
fi
if command -v isort >/dev/null 2>&1; then
    isort "${targets[@]}"
    ran_any=1
else
    echo "skip: isort not installed"
fi

if [[ "${ran_any}" == "0" ]]; then
    echo "no formatters available in this environment"
fi
echo "OK"
