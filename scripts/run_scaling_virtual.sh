#!/bin/bash
# Virtual-mesh scaling sweep: all 8 sharded paths x 1/2/4/8 devices on an
# 8-virtual-device CPU mesh (the only multi-device option in this dev
# environment; on a real pod slice drop --virtual). Produces the committed
# artifacts scripts/sample_scaling_virtual.{csv,log}.
set -e
cd "$(dirname "$0")/.."
PRESET="${1:-cavity10_like}"
CSV=scripts/sample_scaling_virtual.csv
LOG=scripts/sample_scaling_virtual.log
: > "$CSV"; : > "$LOG"
first=1
for path in dia_halo dia_halo_df ell_ring ell_rows csr_psum routed_md window_halo routed_spmd; do
  out=$(PALLAS_AXON_POOL_IPS= python -m spmv_openmp_cuda_tpu.bench.scaling \
        --preset "$PRESET" --devices 1 2 4 8 --path "$path" --virtual 8 \
        2>>"$LOG")
  if [ $first -eq 1 ]; then echo "$out" >> "$CSV"; first=0
  else echo "$out" | tail -n +2 >> "$CSV"; fi
done
cat "$CSV"
