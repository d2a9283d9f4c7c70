#!/usr/bin/env python
"""Round-5: conflict rate of TODAY's window coloring at residue-pair
granularity.

Packed assembly needs, per (block, slot row, residue-pair p2 = jres % 64),
a single window row q. Today's coloring guarantees one q per (row,
RESIDUE); a (row, p2) conflict = both residues r and r+64 present with
different q. Measures how many slots would need relocation, and how much
room the rows have (free lanes) for a greedy fixup.

CPU-only: PALLAS_AXON_POOL_IPS= python scripts/probe_pair_conflicts.py
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from spmv_openmp_cuda_tpu.config import LANE
from spmv_openmp_cuda_tpu.formats.convert import coo_to_csr
from spmv_openmp_cuda_tpu.formats import window as W
from spmv_openmp_cuda_tpu.utils import synth


def color_like_prepare(csr, g, cap):
    """Replicates prepare_window's srow assignment (window.py:477-507)."""
    base = W._base_fields(csr)
    q, blk, lane, jres, gid = W._entry_fields(csr, g, base)
    nblocks = -(-csr.shape[0] // (g * LANE))
    srow = np.empty(gid.shape[0], np.int64)
    caps = W._cap_bands(cap)
    bands, v = W._class_split(blk, lane, jres, gid, nblocks, caps)
    k_c = 8 * sum(caps)
    cls = gid % 8
    keep = np.zeros(gid.shape[0], bool)
    base_row = 0
    for cap_b, keep_b in zip(caps, bands):
        for r in range(8):
            sel = keep_b & (cls == r)
            if not sel.any():
                continue
            colors = W._pack_coloring(
                blk[sel], lane[sel], jres[sel], nblocks, cap_b
            )
            srow[sel] = base_row + r + 8 * colors
        keep |= keep_b
        base_row += 8 * cap_b
    if v:
        of = ~keep
        colors = W._pack_coloring(blk[of], lane[of], jres[of], nblocks, v)
        srow[of] = k_c + colors
    return q, blk, lane, jres, gid, srow, k_c, v, nblocks


def conflicts(name, g, cap):
    t0 = time.time()
    csr = coo_to_csr(synth.preset(name))
    q, blk, lane, jres, gid, srow, k_c, v, nblocks = color_like_prepare(
        csr, g, cap
    )
    k_pad = k_c + v
    p2 = jres % 64
    # per (block, row, p2): distinct q count
    cell = (blk * k_pad + srow) * 64 + p2
    uq = np.unique(np.stack([cell, q]), axis=1)
    dq = np.bincount(uq[0], minlength=nblocks * k_pad * 64)
    ncells = int((np.bincount(cell, minlength=nblocks * k_pad * 64) > 0).sum())
    conf_cells = int((dq > 1).sum())
    # slots in conflicted cells
    conf_mask = dq[cell] > 1
    # row fullness: free lanes per (block,row)
    rowkey = blk * k_pad + srow
    rowfill = np.bincount(rowkey, minlength=nblocks * k_pad)
    print(
        f"== {name} g={g} cap={cap}: k_c={k_c} v={v} k_pad={k_pad} "
        f"({time.time()-t0:.0f}s)"
    )
    print(
        f"  cells(p2 used)={ncells}  conflicted={conf_cells} "
        f"({conf_cells/ncells:.2%})  slots in conflict={int(conf_mask.sum())} "
        f"({conf_mask.sum()/csr.nnz:.2%} of nnz)"
    )
    print(
        f"  row fill: mean {rowfill[rowfill>0].mean():.1f}/128, "
        f"p99 {np.percentile(rowfill[rowfill>0], 99):.0f}"
    )
    sys.stdout.flush()


if __name__ == "__main__":
    conflicts("thermal2_like", 24, (16, 8, 4))
    conflicts("fem_3d_thermal2_like", 40, 128)
