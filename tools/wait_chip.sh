#!/bin/bash
# Block until the TPU relay accepts and completes a small fresh compile
# (jax.devices() stays green during relay wedges; remote_compile is the
# path that hangs — probe exactly that). Used as a job prefix in the
# phase-2 queue so a tunnel outage costs wait time, not job slots.
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:/root/.axon_site${PYTHONPATH:+:$PYTHONPATH}"
while true; do
    if timeout 180 python - <<'PY' > /dev/null 2>&1
import time, jax, jax.numpy as jnp
n = 128 + (int(time.time()) % 97) * 8  # fresh shape -> fresh compile
x = jnp.ones((n, n), jnp.bfloat16)
jax.jit(lambda a: (a @ a).sum())(x).block_until_ready()
PY
    then exit 0; fi
    echo "[$(date +%H:%M:%S)] chip probe failed; retry in 60s" >&2
    sleep 60
done
