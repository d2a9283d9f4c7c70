#!/usr/bin/env python
"""Audit the ell_ring comm/compute overlap claim (VERDICT r3 weak #4).

Two levels of evidence, printed and exit-coded:

1. DEPENDENCY level (provable off-TPU, asserted here): in the ring loop
   body, the local multiply consumes the PRE-permute x chunk and the
   ppermute consumes the same pre-permute chunk — neither depends on the
   other, so a latency-hiding scheduler is FREE to run the collective
   concurrently with the multiply. This is checked on the jaxpr: the
   ppermute's output var must not feed any arithmetic op of the same body.

2. SCHEDULE level (hardware-dependent): whether XLA actually splits the
   collective-permute into async start/done around the multiply is decided
   by the backend scheduler (TPU: async collectives on by default; CPU:
   always synchronous custom-calls). The compiled HLO for the current
   backend is dumped and grepped for collective-permute-start/done; on a
   CPU mesh the absence of async pairs says nothing about TPU — the audit
   records which backend produced the evidence.

Run CPU (8 virtual devices):
    PALLAS_AXON_POOL_IPS= python scripts/audit_ring_overlap.py
"""
import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

import spmv_openmp_cuda_tpu as S  # noqa: E402
from spmv_openmp_cuda_tpu.io.vectors import fill_rnd_vector  # noqa: E402
from spmv_openmp_cuda_tpu.parallel import mesh as M  # noqa: E402
from spmv_openmp_cuda_tpu.parallel import sharded as sh  # noqa: E402
from spmv_openmp_cuda_tpu.utils import synth  # noqa: E402


def main() -> int:
    mesh = M.make_mesh((8, 1))
    coo = synth.power_law(512, 512, 5.0, seed=3)
    csr = S.coo_to_csr(coo)
    op = sh.prepare_ring_ell(csr, mesh)
    x = sh.pad_x_for_ring(
        np.asarray(fill_rnd_vector(512, seed=4)), op, mesh, jnp.float32
    )
    spmv = sh.make_ell_ring(mesh, op)

    # --- 1) dependency-level audit on the jaxpr --------------------------
    jaxpr = jax.make_jaxpr(spmv)(op, x)
    text = str(jaxpr)
    # find the while-loop body: ppermute output must not feed mul/dot/add
    # in the same body (i.e. the multiply reads the carried chunk, not the
    # permuted one)
    ppermute_lines = [
        ln for ln in text.splitlines() if "ppermute" in ln
    ]
    assert ppermute_lines, "no ppermute in the ring jaxpr"
    ok_dep = True
    for ln in ppermute_lines:
        m = re.match(r"\s*([a-z]+(?:\[[^\]]*\])?(?:\s*,\s*[a-z]+)*)\s*=", ln)
        if not m:
            continue
        outs = [v.strip() for v in re.split(r"[,\s]+", m.group(1)) if v]
        for v in outs:
            # the permuted chunk may only be consumed by the loop carry
            # plumbing; any arithmetic consumer in the body breaks overlap
            uses = [
                u
                for u in text.splitlines()
                if re.search(rf"\b{re.escape(v)}\b", u)
                and "=" in u
                and not u.strip().startswith(v)
                and any(
                    op_ in u for op_ in ("mul", "dot_general", "add_any")
                )
            ]
            if uses:
                ok_dep = False
                print(f"DEP-FAIL: ppermute out {v} feeds arithmetic: {uses}")
    print(
        "dependency audit: "
        + ("OK — multiply consumes the pre-permute chunk; the collective "
           "is schedulable concurrently" if ok_dep else "FAILED")
    )

    # --- 2) schedule-level audit on the compiled HLO ---------------------
    compiled = jax.jit(spmv).lower(op, x).compile()
    hlo = compiled.as_text()
    starts = hlo.count("collective-permute-start")
    dones = hlo.count("collective-permute-done")
    syncs = len(re.findall(r"collective-permute(?!-)", hlo))
    backend = jax.default_backend()
    print(
        f"schedule audit ({backend}): collective-permute-start={starts} "
        f"done={dones} sync={syncs}"
    )
    if backend != "tpu":
        print(
            "NOTE: CPU lowering is always synchronous; the async start/done "
            "split is a TPU-scheduler decision. The dependency audit above "
            "is the portable guarantee."
        )
    return 0 if ok_dep else 1


if __name__ == "__main__":
    sys.exit(main())
