#!/usr/bin/env python
"""Roofline / %-of-memory-floor accounting for the committed bench record.

For each BENCH_DETAILS*.json row, re-prepares the recorded engine on CPU
(selection is host-side and deterministic) and sums the bytes the engine
MUST stream from HBM once per SpMV:

  floor_bytes = every device array of the prepared format (values, packed
                indices, routing plans) + one x read + one y write

  floor_time  = floor_bytes / HBM_BW;   headroom = measured / floor

HBM_BW uses the chip's practically attainable slab bandwidth measured by
scripts/probe_floor.py (~700 GB/s of the 819 GB/s v5e peak). The floor
deliberately EXCLUDES intermediate slab round trips (the routed engine's
inter-kernel x2/x5 traffic) and VPU pass time — the headroom column is the
honest upper bound on what further fusion/packing could recover, judged
against the chip, not the 2019-GPU reference.

Pure host tool (PALLAS_AXON_POOL_IPS= ; never touches the TPU):

    python scripts/roofline.py [BENCH_DETAILS.json ...]
"""
import json
import os
import sys

HBM_BW = 700e9  # measured attainable slab bandwidth (probe_floor.py)
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _nbytes(a):
    return 0 if a is None else a.size * a.dtype.itemsize


def _tree_bytes(obj):
    import jax

    return sum(_nbytes(x) for x in jax.tree_util.tree_leaves(obj))


def floor_bytes(ops, d):
    """Format bytes + x read + y write for one SpMV."""
    fmt = _tree_bytes(ops)
    return fmt + d["n"] * 4 + d["m"] * 4


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")

    import spmv_openmp_cuda_tpu as S
    from spmv_openmp_cuda_tpu.config import Config
    from spmv_openmp_cuda_tpu.ops import registry
    from spmv_openmp_cuda_tpu.utils import synth

    paths = sys.argv[1:] or [os.path.join(REPO, "BENCH_DETAILS.json")]
    rows = []
    for p in paths:
        with open(p) as f:
            rows += json.load(f)
    print(
        "| matrix | kernel | GF/s | stream MB | B/nnz | floor us | "
        "measured us | headroom | % of HBM floor |"
    )
    print("|---|---|---|---|---|---|---|---|---|")
    for d in rows:
        cfg = Config(dtype=d["dtype"])
        coo = synth.preset(d["matrix"], seed=0)
        csr = S.coo_to_csr(coo)
        try:
            ell = S.coo_to_ell(coo)
        except Exception:
            ell = None
        spec = registry.get(d["kernel"])
        ops = spec.prepare(csr, ell, cfg)
        b = floor_bytes(ops, d)
        t_floor = b / HBM_BW
        hr = d["time_s"] / t_floor
        print(
            f"| {d['matrix']} | {d['kernel']} | {d['gflops']:.1f} | "
            f"{b / 1e6:.1f} | {b / d['nnz']:.1f} | {t_floor * 1e6:.1f} | "
            f"{d['time_s'] * 1e6:.1f} | {hr:.2f}x | {100 / hr:.0f}% |"
        )


if __name__ == "__main__":
    main()
