#!/bin/bash
# Hermetic CPU test run: bypass the axon TPU sitecustomize (PYTHONPATH=)
# so tests never contend for the single TPU grant, and expose 8 virtual
# CPU devices for mesh tests.
exec env PYTHONPATH= JAX_PLATFORMS=cpu \
    XLA_FLAGS="--xla_force_host_platform_device_count=8" \
    python -m pytest "${@:-tests/}" -q
