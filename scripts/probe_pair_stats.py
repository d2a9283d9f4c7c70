#!/usr/bin/env python
"""Round-5 feasibility stats for packed-pair (int32 = 2 x bf16) window
assembly.

The packed assembly taa carries residues r and r+64 in one int32 lane of
the transposed window; a slot row may then use BOTH residues of a pair
ONLY at a single shared window row q. This probe measures, on the window
proxies' exact prepare geometry, the degree structure that decides
whether the packed coloring keeps k_pad:

  lane  : per-(block, class) out-lane degree (today's left side)
  res   : per-(block, class) residue degree (today's right side)
  pair  : per-(block, class) residue-PAIR degree (naive pair coloring --
          k_pad doubles if this binds)
  pairq : per-(block, class, pair) DISTINCT-q count (the round-A degree of
          the capacity-2 scheme: one representative slot per (pair, q)
          bundle; secondaries share rows data-driven)

Run CPU-only: PALLAS_AXON_POOL_IPS= python scripts/probe_pair_stats.py
"""
import sys

import numpy as np

sys.path.insert(0, ".")

from spmv_openmp_cuda_tpu.config import LANE
from spmv_openmp_cuda_tpu.formats.convert import coo_to_csr
from spmv_openmp_cuda_tpu.formats import window as W
from spmv_openmp_cuda_tpu.utils import synth


def stats(name, g):
    coo = synth.preset(name)
    csr = coo_to_csr(coo)
    base = W._base_fields(csr)
    q, blk, lane, jres, gid = W._entry_fields(csr, g, base)
    nblocks = -(-csr.shape[0] // (g * LANE))
    cls = gid % 8
    key = (blk * 8 + cls) * LANE

    def degs(side):
        d = np.bincount(key + side, minlength=nblocks * 8 * LANE)
        return d

    dl = degs(lane)
    dr = degs(jres)
    p2 = jres % 64
    dp_k = (blk * 8 + cls) * 64 + p2
    dp = np.bincount(dp_k, minlength=nblocks * 8 * 64)
    # distinct q per (block, class, pair)
    uq = np.unique(np.stack([dp_k, q]), axis=1)
    dpq = np.bincount(uq[0], minlength=nblocks * 8 * 64)
    # distinct q per (block, class, residue) for reference
    ur = np.unique(np.stack([key + jres, q]), axis=1)
    drq = np.bincount(ur[0], minlength=nblocks * 8 * LANE)

    def s(d):
        nz = d[d > 0]
        return (f"max {d.max():4d}  p99 {np.percentile(nz, 99):6.1f}  "
                f"mean(nz) {nz.mean():5.2f}")

    print(f"== {name} g={g} nblocks={nblocks} nnz={csr.nnz}")
    print(f"  lane : {s(dl)}")
    print(f"  res  : {s(dr)}")
    print(f"  resq : {s(drq)}   (distinct q per residue)")
    print(f"  pair : {s(dp)}")
    print(f"  pairq: {s(dpq)}   (distinct q per pair = round-A degree)")
    sys.stdout.flush()


if __name__ == "__main__":
    stats("thermal2_like", 24)
    stats("fem_3d_thermal2_like", 40)
