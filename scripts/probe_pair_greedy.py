#!/usr/bin/env python
"""Round-5: prototype the capacity-aware pair-packed window coloring.

Packed assembly constraint set per slot row: <=1 slot per lane; per
residue-pair p2 = jres % 64 a SINGLE window row q (any number of slots may
share it — the gather just indexes the packed element). This is weaker
per-residue than today's proper coloring (which allows 2 distinct q per
(row, p2)) but the pair-q exclusivity needs a dedicated greedy:

  per (block, class): bundles = slots grouped by (p2, q), processed in
  size-desc order; each slot goes to the first row with its lane free and
  p2 either unset or already == q (prefer rows already serving the
  bundle). New rows appended as needed.

Reports rows-used distribution per (block, class) -> the k_c this scheme
would need vs today's, and the overflow row count when capping the class
region at today's budget.

CPU-only: PALLAS_AXON_POOL_IPS= python scripts/probe_pair_greedy.py
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from spmv_openmp_cuda_tpu.config import LANE
from spmv_openmp_cuda_tpu.formats.convert import coo_to_csr
from spmv_openmp_cuda_tpu.formats import window as W
from spmv_openmp_cuda_tpu.utils import synth


def greedy_block_class(lanes, p2s, qs, budget=None):
    """Greedy packer for one (block, class): returns rows used (list of
    slot counts) and indices of slots that did not fit under budget."""
    # bundle sort: group by (p2, q), size desc
    key = p2s.astype(np.int64) * 256 + qs
    order = np.argsort(key, kind="stable")
    ks = key[order]
    # bundle boundaries
    starts = np.r_[0, np.where(ks[1:] != ks[:-1])[0] + 1]
    ends = np.r_[starts[1:], ks.size]
    sizes = ends - starts
    border = np.argsort(-sizes, kind="stable")
    lane_masks = []  # python ints as 128-bit masks
    qmaps = []  # per row: dict-free int8 array of 64, -1 = unset
    overflow = []
    for b in border:
        sl = order[starts[b] : ends[b]]
        p2 = int(p2s[sl[0]])
        q = int(qs[sl[0]])
        # candidate rows: those with qmap[p2] == q, then unset
        cands = [
            i for i in range(len(lane_masks)) if qmaps[i][p2] == q
        ] + [i for i in range(len(lane_masks)) if qmaps[i][p2] == -1]
        for s in sl:
            l = int(lanes[s])
            bit = 1 << l
            placed = False
            for ci in range(len(cands)):
                i = cands[ci]
                if not (lane_masks[i] & bit):
                    lane_masks[i] |= bit
                    if qmaps[i][p2] == -1:
                        qmaps[i][p2] = q
                    placed = True
                    break
            if not placed:
                if budget is not None and len(lane_masks) >= budget:
                    overflow.append(s)
                    continue
                lane_masks.append(bit)
                qm = np.full(64, -1, np.int16)
                qm[p2] = q
                qmaps.append(qm)
                cands.append(len(lane_masks) - 1)
    return len(lane_masks), overflow


def run(name, g, budget_rows):
    t0 = time.time()
    csr = coo_to_csr(synth.preset(name))
    base = W._base_fields(csr)
    q, blk, lane, jres, gid = W._entry_fields(csr, g, base)
    nblocks = -(-csr.shape[0] // (g * LANE))
    cls = (gid % 8).astype(np.int64)
    p2 = (jres % 64).astype(np.int8)
    wr, nspecs, nblocks2, _, _ = W._scan_g(csr, g, base, want_hist=False)
    dq = (q - blk * g + wr).astype(np.int16)  # window row (pre-staging)
    key = (blk * 8 + cls).astype(np.int64)
    order = np.argsort(key, kind="stable")
    ks = key[order]
    starts = np.r_[0, np.where(ks[1:] != ks[:-1])[0] + 1]
    ends = np.r_[starts[1:], ks.size]
    rows_used = []
    n_over = 0
    for s0, s1 in zip(starts, ends):
        sl = order[s0:s1]
        used, over = greedy_block_class(
            lane[sl], p2[sl], dq[sl], budget=budget_rows
        )
        rows_used.append(used)
        n_over += len(over)
    ru = np.array(rows_used)
    print(
        f"== {name} g={g} budget={budget_rows}: rows/class max {ru.max()} "
        f"p99 {np.percentile(ru, 99):.0f} mean {ru.mean():.1f}; "
        f"overflow slots {n_over} ({n_over/csr.nnz:.2%}) "
        f"({time.time()-t0:.0f}s)"
    )
    sys.stdout.flush()


if __name__ == "__main__":
    run("fem_3d_thermal2_like", 40, None)
    run("thermal2_like", 24, None)
