"""Test harness configuration.

Tests run on CPU with 8 virtual devices so sharding logic is exercised
without TPU hardware (survey §4 "Distributed" strategy).  Must run before
jax initialises its backends, hence the env mutation at import time.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon TPU plugin (sitecustomize) force-selects the tunneled TPU via
# jax.config regardless of JAX_PLATFORMS in the environment; override it back
# so tests really run on the 8-virtual-device CPU backend.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from kb2e_tpu.data import synthetic  # noqa: E402
from kb2e_tpu.data import triples as triples_lib  # noqa: E402


@pytest.fixture(scope="session")
def tiny_kg_dir(tmp_path_factory):
    """A 64-entity planted KG in reference directory layout."""
    d = tmp_path_factory.mktemp("tiny_kg")
    synthetic.make_kg_dir(str(d), n_entities=64, n_relations=8, n_triples=1200, seed=7)
    return str(d)


@pytest.fixture(scope="session")
def tiny_dataset(tiny_kg_dir):
    return triples_lib.load_dataset(
        tiny_kg_dir, splits=("train", "valid", "test"), use_native=False
    )
