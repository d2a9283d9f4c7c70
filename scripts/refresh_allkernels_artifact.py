#!/usr/bin/env python
"""Regenerate scripts/sample_allkernels_tpu.{log,csv} on real TPU.

Runs EVERY registered compute mode (the reference harness's all-kernels
sweep, SpMV_test.cu:152-389) against the small/medium honest proxies,
oracle-checked with determinism verification, and reduces to CSV. The big
FEM proxies are excluded to bound remote-compile time; their engine numbers
live in BENCH_DETAILS.json.

Usage:  python scripts/refresh_allkernels_artifact.py [preset ...]
"""
import io
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

PRESETS = ["west2021_like", "delaunay_n12_like", "cavity10_like", "caida_like"]


def main() -> int:
    import spmv_openmp_cuda_tpu as S
    from spmv_openmp_cuda_tpu.bench.harness import format_log, run_all
    from spmv_openmp_cuda_tpu.bench.parse_log import parse_lines, write_csv
    from spmv_openmp_cuda_tpu.config import Config
    from spmv_openmp_cuda_tpu.io.vectors import fill_rnd_vector
    from spmv_openmp_cuda_tpu.utils import synth

    presets = sys.argv[1:] or PRESETS
    cfg = Config()
    out = io.StringIO()
    for name in presets:
        print(f"== {name}", file=sys.stderr, flush=True)
        coo = synth.preset(name, seed=0)
        csr = S.coo_to_csr(coo)
        try:
            ell = S.coo_to_ell(coo)
        except Exception:
            ell = None
        x = fill_rnd_vector(coo.shape[1], seed=1)
        report = run_all(csr, ell, x, cfg, name=name)
        log = format_log(report, cfg)
        print(log, file=sys.stderr, flush=True)
        out.write(log + "\n")
    base = os.path.dirname(__file__)
    with open(os.path.join(base, "sample_allkernels_tpu.log"), "w") as f:
        f.write(out.getvalue())
    rows = parse_lines(out.getvalue().splitlines())
    with open(
        os.path.join(base, "sample_allkernels_tpu.csv"), "w", newline=""
    ) as f:
        write_csv(rows, f)
    print(f"wrote sample_allkernels_tpu.log/.csv ({len(rows)} rows)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
