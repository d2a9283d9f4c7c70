#!/bin/bash
# Corpus sweep wrapper — analog of the reference's test/testAll.sh:13-38:
# run every matrix (files under $DATA_DIR or the synthetic presets) through
# the harness across the reference's 6 grid configs, tee per-config logs,
# collect failing matrices, then reduce to CSV.
#
# Usage:
#   DATA_DIR=~/matrices ./scripts/test_all.sh      # .mtx corpus sweep
#   ./scripts/test_all.sh                          # synthetic preset corpus
#   KERNELS=CSR_ROWS,ELL_ROWS ./scripts/test_all.sh
set -u
cd "$(dirname "$0")/.."
LOGDIR=${LOGDIR:-/tmp/spmv_sweep_logs}
mkdir -p "$LOGDIR"
CORPUS=${DATA_DIR:-}
KERNEL_ARG=${KERNELS:+--kernels "$KERNELS"}

# build the native ingestion backend (binary is untracked; io/native.py
# falls back to numpy when absent, so a failed build only costs speed)
make -C native || echo "warn: native build failed (numpy fallback)" >&2

rc=0
python -m spmv_openmp_cuda_tpu.bench.sweep ${CORPUS} --full-grids ${KERNEL_ARG} \
    --log "$LOGDIR/testAll.log" || rc=$?
if [ $rc -ne 0 ]; then
    echo "sweep recorded failures (see $LOGDIR/testAll_errors)" >&2
    touch "$LOGDIR/testAll_errors"
fi
python -m spmv_openmp_cuda_tpu.bench.parse_log "$LOGDIR/testAll.log" \
    -o "$LOGDIR/testAll.csv"
python -m spmv_openmp_cuda_tpu.bench.parse_log "$LOGDIR/testAll.log" --pivot \
    -o "$LOGDIR/testAll_pivot.csv"
echo "logs: $LOGDIR/testAll.log  csv: $LOGDIR/testAll.csv (+ _pivot)"
exit $rc
