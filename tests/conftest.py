"""Test configuration: force CPU with 8 virtual devices so multi-chip
sharding logic is exercised without TPU hardware (SURVEY.md section 4:
fake-mesh testing the reference lacks).

Note: env vars (JAX_PLATFORMS / XLA_FLAGS) are not sufficient here — this
image's sitecustomize pre-registers a TPU backend, so the platform must be
forced through jax.config before first use."""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np
import pytest

from spmv_openmp_cuda_tpu.formats.matrix import COOMatrix
from spmv_openmp_cuda_tpu.formats.convert import sort_coo


@pytest.fixture
def rng():
    return np.random.default_rng(42)


def make_random_coo(m, n, density, seed=0, val_scale=1.0):
    rng = np.random.default_rng(seed)
    dense = (rng.random((m, n)) < density) * rng.standard_normal((m, n)) * val_scale
    r, c = np.nonzero(dense)
    return sort_coo(
        COOMatrix((m, n), r.astype(np.int64), c.astype(np.int64), dense[r, c])
    ), dense


@pytest.fixture
def small_coo():
    return make_random_coo(37, 29, 0.15, seed=7)


@pytest.fixture
def medium_coo():
    return make_random_coo(300, 257, 0.03, seed=11)
