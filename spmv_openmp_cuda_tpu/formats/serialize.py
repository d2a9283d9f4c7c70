"""Save/load prepared device formats (checkpoint/resume analog).

The reference's closest analog is raw/text vector dumps for offline reuse
(SURVEY.md section 5 checkpoint/resume, utils.c:135-168). Here the expensive
artifact is the *prepared device format* (binning/diagonal extraction over
hundred-million-nnz matrices), so we serialize those to .npz and restore them
without re-running preparation.
"""
from __future__ import annotations

import json
from typing import Union

import jax.numpy as jnp
import numpy as np

from .binned import BinnedCSR
from .dia import DeviceDIA
from .matrix import DeviceCSR, DeviceELL

_KINDS = {"BinnedCSR": BinnedCSR, "DeviceDIA": DeviceDIA, "DeviceELL": DeviceELL, "DeviceCSR": DeviceCSR}

PreparedFormat = Union[BinnedCSR, DeviceDIA, DeviceELL, DeviceCSR]


def save_prepared(path: str, mat: PreparedFormat) -> None:
    import jax

    leaves, treedef = jax.tree_util.tree_flatten(mat)
    meta = {
        "kind": type(mat).__name__,
        # static pytree aux data (offsets/shapes/flags) serialized as JSON
        "aux": _aux_of(mat),
    }
    np.savez_compressed(
        path,
        __meta__=np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8),
        **{f"leaf{i}": np.asarray(l) for i, l in enumerate(leaves)},
    )


def _aux_of(mat: PreparedFormat) -> dict:
    if isinstance(mat, BinnedCSR):
        return {
            "class_offsets": list(mat.class_offsets),
            "class_widths": [list(w) for w in mat.class_widths],
            "class_layouts": list(mat.class_layouts),
            "shape": list(mat.shape),
            "nnz": mat.nnz,
        }
    if isinstance(mat, DeviceDIA):
        return {
            "offsets": list(mat.offsets),
            "shape": list(mat.shape),
            "nnz": mat.nnz,
            "pad_sub": mat.pad_sub,
        }
    if isinstance(mat, DeviceELL):
        return {
            "shape": list(mat.shape),
            "nnz": mat.nnz,
            "max_row_nz": mat.max_row_nz,
            "transposed": mat.transposed,
        }
    if isinstance(mat, DeviceCSR):
        return {"shape": list(mat.shape), "nnz": mat.nnz}
    raise TypeError(type(mat))


def load_prepared(path: str) -> PreparedFormat:
    z = np.load(path)
    meta = json.loads(bytes(z["__meta__"]).decode())
    kind, aux = meta["kind"], meta["aux"]
    leaves = [jnp.asarray(z[f"leaf{i}"]) for i in range(len(z.files) - 1)]
    if kind == "BinnedCSR":
        return BinnedCSR(
            *leaves,
            class_offsets=tuple(aux["class_offsets"]),
            class_widths=tuple(tuple(w) for w in aux["class_widths"]),
            class_layouts=tuple(aux["class_layouts"]),
            shape=tuple(aux["shape"]),
            nnz=aux["nnz"],
        )
    if kind == "DeviceDIA":
        return DeviceDIA(
            *leaves,
            offsets=tuple(aux["offsets"]),
            shape=tuple(aux["shape"]),
            nnz=aux["nnz"],
            pad_sub=aux["pad_sub"],
        )
    if kind == "DeviceELL":
        return DeviceELL(
            *leaves,
            shape=tuple(aux["shape"]),
            nnz=aux["nnz"],
            max_row_nz=aux["max_row_nz"],
            transposed=aux["transposed"],
        )
    if kind == "DeviceCSR":
        return DeviceCSR(*leaves, shape=tuple(aux["shape"]), nnz=aux["nnz"])
    raise ValueError(f"unknown kind {kind}")
