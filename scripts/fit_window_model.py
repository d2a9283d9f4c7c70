#!/usr/bin/env python
"""Fit the window-engine cost model from a calibrate_window.py CSV.

Solves non-negative least squares (projected: clamp + refit) for

    t_us = c_slot*slots + c_tile*tile_vol + c_fold*fold_vol
           + c_pass*pass_vol + c_step*steps

and prints per-config residuals plus the constants in the units
formats/window.py uses (ps per element / per step). Pure host tool:

    python scripts/fit_window_model.py <calibration.csv ...>
"""
import sys

import numpy as np

COLS = ["slots", "tile_vol", "fold_vol", "pass_vol", "steps"]


def load(paths):
    rows = []
    for p in paths:
        with open(p) as f:
            hdr = None
            for line in f:
                line = line.strip()
                if not line or line.startswith("#"):
                    continue
                parts = line.split(",")
                if hdr is None and parts[0] == "preset":
                    hdr = parts
                    continue
                if hdr is None or len(parts) != len(hdr):
                    continue
                rows.append(dict(zip(hdr, parts)))
    return rows


def main():
    rows = load(sys.argv[1:])
    if not rows:
        print("no data rows", file=sys.stderr)
        return 1
    a = np.array([[float(r[c]) for c in COLS] for r in rows])
    t = np.array([float(r["us"]) for r in rows])  # us
    # least squares with nonnegativity by iterative clamping
    active = list(range(len(COLS)))
    coef = np.zeros(len(COLS))
    for _ in range(len(COLS)):
        sol, *_ = np.linalg.lstsq(a[:, active], t, rcond=None)
        if (sol >= 0).all():
            for i, j in enumerate(active):
                coef[j] = sol[i]
            break
        active = [j for i, j in enumerate(active) if sol[i] > 0]
        if not active:
            break
    pred = a @ coef
    print("fit (us = sum coef * col):")
    for c, v in zip(COLS, coef):
        unit = "us/step" if c == "steps" else "ps/elem"
        scale = 1.0 if c == "steps" else 1e6
        print(f"  {c:>9}: {v * scale:10.3f} {unit}")
    rel = np.abs(pred - t) / np.maximum(t, 1e-9)
    print(f"residual: mean {rel.mean()*100:.1f}%  max {rel.max()*100:.1f}%")
    print("per-config (label, measured us, predicted us, err%):")
    for r, p, m in zip(rows, pred, t):
        print(
            f"  {r['preset']}/{r['label']:>14}: {m:9.2f} {p:9.2f} "
            f"{(p-m)/m*100:+6.1f}%"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
