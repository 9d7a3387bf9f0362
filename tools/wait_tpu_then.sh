#!/bin/bash
# Wait until the axon TPU backend answers a trivial matmul, then exec "$@".
# Polls every 120 s; each poll itself is capped at 180 s (backend-init hangs
# when the relay is down). Logs progress to stderr.
while true; do
  if timeout 180 python - <<'EOF' >/dev/null 2>&1
import jax, jax.numpy as jnp
x = jnp.ones((128, 128))
assert float(jnp.max(x @ x)) == 128.0
EOF
  then
    echo "[wait_tpu] TPU is back: $(date)" >&2
    break
  fi
  echo "[wait_tpu] TPU still unavailable: $(date)" >&2
  sleep 120
done
exec "$@"
