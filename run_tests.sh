#!/bin/bash
# CPU test runner.
#
# PYTHONPATH is overridden to drop the axon TPU sitecustomize (its PJRT
# registration adds minutes of interpreter startup and deadlocks when a
# second process claims the single tunneled chip); tests force JAX_PLATFORMS
# =cpu with an 8-device virtual mesh anyway (tests/conftest.py).
cd "$(dirname "$0")"
exec env PYTHONPATH="$(pwd)" JAX_PLATFORMS=cpu \
    python -m pytest "${@:-tests/}"
