"""Test configuration.

JAX tests run on CPU with 8 virtual devices so multi-chip sharding logic is
exercised without TPU hardware (set before any jax import).
"""

import os

# Force CPU with 8 virtual devices: the sandbox exports JAX_PLATFORMS=axon
# (real TPU tunnel) and its sitecustomize imports jax at interpreter start,
# so env vars set here are too late — use jax.config, which still applies
# before first backend use in the test process.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
# the terminal exports --xla_allow_excess_precision=true, which lets XLA:CPU
# contract mul+add into FMA and breaks bit-exact comparisons vs the oracle
flags = flags.replace("--xla_allow_excess_precision=true", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = flags + " --xla_force_host_platform_device_count=8"
os.environ["XLA_FLAGS"] = flags.strip()

import jax

jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_num_cpu_devices", 8)
except Exception:
    pass  # older jax: the XLA_FLAGS fallback above covers it

import random

import numpy as np
import pytest


@pytest.fixture
def rng():
    return random.Random(1234)


@pytest.fixture
def nprng():
    return np.random.default_rng(1234)


BASES = "ACGT"


def random_dna(rng, length):
    return "".join(rng.choice(BASES) for _ in range(length))


def mutate(rng, seq, n_snp=0, n_ins=0, n_del=0):
    seq = list(seq)
    for _ in range(n_snp):
        i = rng.randrange(len(seq))
        seq[i] = rng.choice([b for b in BASES if b != seq[i]])
    for _ in range(n_ins):
        i = rng.randrange(len(seq))
        seq[i:i] = [rng.choice(BASES) for _ in range(rng.randint(1, 3))]
    for _ in range(n_del):
        i = rng.randrange(len(seq) - 4)
        del seq[i : i + rng.randint(1, 3)]
    return "".join(seq)
