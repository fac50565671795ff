#!/usr/bin/env bash
# Environment knobs (reference script/setup_env.sh). Source this for CPU-mesh
# runs without real TPUs:
export PALLAS_AXON_POOL_IPS=
export JAX_PLATFORMS=cpu
export XLA_FLAGS="--xla_force_host_platform_device_count=8 ${XLA_FLAGS:-}"
