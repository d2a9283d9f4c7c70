"""Corpus sweep: run the full harness over every matrix in a directory (or
the synthetic preset corpus) across grid configurations.

Analog of the reference's test/testAll.sh:13-38 (every *.mtx under a data dir
x 6 GRID_ROWS x GRID_COLS configs, logs teed per config, failing matrices
collected and the sweep continues) — in-process instead of bash, same grid
list, same failure-tolerant behavior.
"""
from __future__ import annotations

import argparse
import glob
import os
import sys
import traceback
from typing import List, Optional, Sequence, Tuple

import numpy as np

from ..config import Config
from ..formats.convert import EllSizeError, coo_to_csr, coo_to_ell
from ..io.mmio import read_coo
from ..io.vectors import fill_rnd_vector
from ..utils import synth
from .harness import format_log, run_all

#: The reference's OMP sweep grid list (testAll.sh:21-36).
DEFAULT_GRIDS: List[Tuple[int, int]] = [
    (8, 5), (5, 8), (10, 4), (4, 10), (14, 3), (13, 3),
]


def load_matrix(path_or_preset: str):
    """Either a .mtx[.gz|...] path or a synthetic preset name."""
    if os.path.exists(path_or_preset):
        name = os.path.basename(path_or_preset)
        coo = read_coo(path_or_preset)
    else:
        name = path_or_preset
        coo = synth.preset(path_or_preset)
    return name, coo


def sweep(
    matrices: Sequence[str],
    grids: Sequence[Tuple[int, int]] = ((8, 8),),
    cfg_base: Optional[Config] = None,
    kernels: Optional[Sequence[str]] = None,
    log_stream=None,
) -> Tuple[List[str], List[str]]:
    """Returns (log lines accumulated, failing matrix names)."""
    log_stream = log_stream or sys.stdout
    failures: List[str] = []
    logs: List[str] = []
    for spec in matrices:
        name = os.path.basename(spec) if os.path.exists(spec) else spec
        try:
            name, coo = load_matrix(spec)
            csr = coo_to_csr(coo)
            try:
                ell = coo_to_ell(coo)
            except EllSizeError as e:
                print(f"#ell-skipped: {name}: {e}", file=log_stream)
                ell = None
            x = fill_rnd_vector(coo.shape[1], seed=0)
            import dataclasses as _dc

            for gr, gc in grids:
                cfg = _dc.replace(
                    cfg_base or Config(), grid_rows=gr, grid_cols=gc
                )
                report = run_all(csr, ell, x, cfg, kernels=kernels, name=name)
                text = format_log(report, cfg)
                logs.append(text)
                print(text, file=log_stream, flush=True)
                if not report.all_ok and name not in failures:
                    failures.append(name)
        except Exception:
            # the sweep records failures and continues (testAll.sh:17,25)
            if name not in failures:
                failures.append(name)
            traceback.print_exc(file=sys.stderr)
    return logs, failures


def main(argv: Optional[List[str]] = None) -> int:
    p = argparse.ArgumentParser(description="SpMV corpus sweep")
    p.add_argument(
        "corpus",
        nargs="*",
        default=[],
        help=".mtx files/dirs or preset names; default = synthetic presets",
    )
    p.add_argument("--grids", default="8x8", help="comma list, e.g. 8x5,5x8,10x4")
    p.add_argument("--full-grids", action="store_true", help="use the reference's 6-grid list")
    p.add_argument("--kernels", default=None, help="comma list of compute modes")
    p.add_argument("--log", default=None, help="tee log file")
    args = p.parse_args(argv)

    matrices: List[str] = []
    for c in args.corpus:
        if os.path.isdir(c):
            matrices.extend(sorted(glob.glob(os.path.join(c, "*.mtx*"))))
        else:
            matrices.append(c)
    if not matrices:
        matrices = list(synth.PRESETS)

    grids = DEFAULT_GRIDS if args.full_grids else [
        tuple(int(v) for v in g.split("x")) for g in args.grids.split(",")
    ]
    kernels = args.kernels.split(",") if args.kernels else None
    stream = open(args.log, "w") if args.log else sys.stdout
    try:
        _, failures = sweep(matrices, grids, kernels=kernels, log_stream=stream)
    finally:
        if stream is not sys.stdout:
            stream.close()
    if failures:
        print(f"FAILURES: {failures}", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
