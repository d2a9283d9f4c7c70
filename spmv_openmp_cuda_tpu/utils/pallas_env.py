"""Shared Pallas environment helpers."""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import LANE


def interpret() -> bool:
    """Run Pallas kernels in interpreter mode off-TPU (CPU tests)."""
    return jax.default_backend() != "tpu"


def n_windows_for(n_cols: int, max_col_window: int, window_elems: int) -> int:
    """Window count covering all n_cols columns (not just the populated
    ones — trailing all-zero columns must still pad cleanly)."""
    return max(max_col_window + 1, -(-max(n_cols, 1) // window_elems))


def pack_x_windows_flat(x, nwin: int, n: int, dtype, window_panels: int):
    """x -> transposed window stack, flattened rows: rows [w*128, (w+1)*128)
    hold window w as (residue, panel)."""
    xp = jnp.pad(x.astype(dtype), (0, nwin * window_panels * LANE - n))
    return (
        xp.reshape(nwin, window_panels, LANE)
        .transpose(0, 2, 1)
        .reshape(nwin * LANE, LANE)
    )
