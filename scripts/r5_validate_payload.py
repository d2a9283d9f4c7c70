#!/usr/bin/env python
"""Round-5 on-TPU queue (run via scripts/tpu_claim_run.py).

Stages (R5_STAGES, comma-separated; default the f32 window A/B group):

  verify_cli — the verify skill's fast end-to-end drive: synth fixture
               through the CLI with --check (AUTO + one forced mode).
  ab_pack    — packed-pair window A/B on the two window headline proxies
               (BENCH_AB adds PL_CSR_WINDOW_PACK + routed to the
               candidate set) -> R5_OUT/abpack/.
  ab_batched — batched-UNPACKED forced configs on thermal2
               (SPMV_WINDOW_PACK="g,bps,b" ladder, candidates pinned to
               PL_CSR_WINDOW_PACK) -> R5_OUT/abb_*/.
  hl_suite   — full f32 headline refresh -> R5_OUT/hl/.
"""
import os

import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.chdir(REPO)

from _payload_common import bench_inproc as _bi, run_stages  # noqa: E402

STAGES = os.environ.get("R5_STAGES", "verify_cli,ab_pack,ab_batched").split(",")
OUT = os.environ.get("R5_OUT", "/tmp/r5bench")
os.makedirs(OUT, exist_ok=True)


def bench_inproc(subdir, **env):
    _bi(OUT, subdir, **env)


def stage_verify_cli():
    # in-process (runpy): the payload already holds the exclusive TPU
    # claim, a CLI subprocess could not claim it again
    import runpy

    from spmv_openmp_cuda_tpu.utils import synth
    from spmv_openmp_cuda_tpu.io.mmio import write_mtx

    write_mtx("/tmp/vfy_r5.mtx", synth.banded(2000, 2000, 8, fill=0.9, seed=7))
    for mode in ("AUTO", "PL_CSR_WINDOW_PACK"):
        t0 = time.time()
        saved = sys.argv
        sys.argv = ["spmv", "/tmp/vfy_r5.mtx", "RNDVECT", mode, "--check",
                    "--no-dump"]
        try:
            runpy.run_module("spmv_openmp_cuda_tpu", run_name="__main__")
            rc = 0
        except SystemExit as e:
            rc = e.code or 0
        finally:
            sys.argv = saved
        print(f"[verify_cli] {mode} rc={rc} ({time.time()-t0:.0f}s)",
              flush=True)


def stage_ab_pack():
    bench_inproc(
        "abpack", BENCH_AB="1",
        BENCH_ONLY="thermal2_like,fem_3d_thermal2_like",
    )


def stage_ab_batched():
    for cfg in ("24,4,b", "16,4,b", "8,8,b"):
        bench_inproc(
            "abb_" + cfg.replace(",", "_"),
            BENCH_ONLY="thermal2_like",
            BENCH_CANDS="PL_CSR_WINDOW_PACK",
            SPMV_WINDOW_PACK=cfg,
        )


def stage_hl_suite():
    bench_inproc("hl")


if __name__ == "__main__":
    run_stages(STAGES, {
        "verify_cli": stage_verify_cli,
        "ab_pack": stage_ab_pack,
        "ab_batched": stage_ab_batched,
        "hl_suite": stage_hl_suite,
    })
