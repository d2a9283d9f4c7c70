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


def stage_sg_audit():
    # sg_like structure audit (round-5 task 9): measure the adversarial
    # no-locality twin so the SG extended-suite row carries a measured
    # lower bound instead of an unverified structure guess
    import json

    import bench as B

    cfg = B.make_cfg("float32")
    det = B.measure_proxy(
        "sg_rand_like", 2.25, ["PL_CSR_ROUTED_BF16"], cfg
    )
    out = os.path.join(OUT, "sg_audit.json")
    with open(out, "w") as f:
        json.dump(det, f, indent=1)
    print(f"[sg_audit] wrote {out}: {det}", flush=True)


def stage_ab_staged():
    # round-5b: the scratch-staged kernel variant (SPMV_WINDOW_PACK_STAGE
    # defaults to 1 now) vs the measured value-direct losses
    for cfg in ("16,4,b", "8,8,b"):
        bench_inproc(
            "abs_" + cfg.replace(",", "_"),
            BENCH_ONLY="thermal2_like",
            BENCH_CANDS="PL_CSR_WINDOW_PACK",
            SPMV_WINDOW_PACK=cfg,
        )
    bench_inproc(
        "abs_fem16_4",
        BENCH_ONLY="fem_3d_thermal2_like",
        BENCH_CANDS="PL_CSR_WINDOW_PACK",
        SPMV_WINDOW_PACK="16,4",
    )
    # same-geometry probe: batched-unpacked at fem's record config class
    # (g40/b1, k_pad 1152 vs legacy 1088) isolates the kernel restructure
    bench_inproc(
        "abs_fem40_1b",
        BENCH_ONLY="fem_3d_thermal2_like",
        BENCH_CANDS="PL_CSR_WINDOW_PACK",
        SPMV_WINDOW_PACK="40,1,b",
    )


def stage_f64_raefsky_ab():
    # task 3: raefsky df margin (1.066x) — try the window-df engine
    # against the DIA-resid record holder
    bench_inproc(
        "f64raef", SPMV_DTYPE="float64", BENCH_ONLY="raefsky1_like",
        BENCH_CANDS="PL_DIA_RESID_F64,PL_CSR_WINDOW_F64",
    )


def stage_f64_fem_batched():
    for cfg in ("40,1", "16,4"):
        bench_inproc(
            "f64fem_" + cfg.replace(",", "_"),
            SPMV_DTYPE="float64",
            BENCH_ONLY="fem_3d_thermal2_like",
            BENCH_CANDS="PL_CSR_WINDOW_F64",
            SPMV_WINDOW_BATCHED_DF=cfg,
        )


if __name__ == "__main__":
    run_stages(STAGES, {
        "verify_cli": stage_verify_cli,
        "ab_pack": stage_ab_pack,
        "ab_batched": stage_ab_batched,
        "ab_staged": stage_ab_staged,
        "f64_raefsky_ab": stage_f64_raefsky_ab,
        "f64_fem_batched": stage_f64_fem_batched,
        "hl_suite": stage_hl_suite,
        "sg_audit": stage_sg_audit,
    })
