#!/bin/bash
# Run mosaic_probe3 probes one per process with tunnel health checks.
cd /root/repo
health() {
  timeout 90 python - <<'PY' >/dev/null 2>&1
import jax, jax.numpy as jnp
from vae_equalizer_tpu.utils.profiling import enable_compilation_cache
enable_compilation_cache()
float(jax.jit(lambda x: (x*2).sum())(jnp.ones((8,128))))
PY
}
for p in sum_ax2 sum_ax1 min_ax1 bcast_sublane bcast_lane bcast_lead bcast_rank2 \
         vslice_off refslice_off make_r11 use_r11 stats_row bcast_r11 out_sub2 iota3 pad3_lane; do
  if ! health; then echo "TUNNEL DOWN before $p — stopping"; exit 1; fi
  if timeout 200 python tools/mosaic_probe3.py "$p" 2>/tmp/probe3_err.txt | grep "PROBE"; then
    :
  else
    echo "PROBE $p FAIL: $(grep -m1 -o 'INTERNAL.*\|Check failed.*\|Error.*' /tmp/probe3_err.txt | head -c 100)"
  fi
done
echo ALL DONE
