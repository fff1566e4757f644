#!/usr/bin/env bash
# Entrypoint (replaces docker_base/run_files/run.sh): default runs the
# grand-challenge inference pipeline; `train` runs training; anything else
# is exec'd verbatim.
set -euo pipefail
cd /opt/app

case "${1:-process}" in
  process)
    shift || true
    exec python3 process_pipeline.py "$@"
    ;;
  train)
    shift
    exec python3 train.py "$@"
    ;;
  tests)
    if ! python3 -c 'import pytest' 2>/dev/null; then
      echo "tests mode needs the 'test' image stage" \
           "(docker build . -f docker/Dockerfile — the default target)" >&2
      exit 2
    fi
    exec python3 -m pytest tests/ -q
    ;;
  *)
    exec "$@"
    ;;
esac
