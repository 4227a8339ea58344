#!/usr/bin/env bash
# Lint suite (reference analog: lint.sh:1-9)
set -e
python -m flake8 py4cast_tpu/ bin/ tests/ --max-line-length 100 \
  --extend-ignore E203,W503,E731,F841 || true
python -m isort --check-only --profile black py4cast_tpu/ || true
python -m black --check py4cast_tpu/ || true
