#!/bin/bash
# Fast local test runs: skip the axon TPU-claim handshake (~70s/process)
# and force the CPU backend. The CI driver runs pytest directly instead.
if [ "$#" -eq 0 ]; then
    set -- tests/ -x -q
fi
exec env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python -m pytest "$@"
