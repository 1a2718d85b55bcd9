"""Test config: run everything on a simulated 8-device CPU mesh.

Multi-chip sharding is validated without TPU hardware via XLA's host
platform device-count override (SURVEY.md section 4.5).  Must be set
before jax is imported anywhere.
"""

import os

# Force the CPU backend: the test suite validates semantics and sharding on
# a virtual 8-device mesh; the real chip (JAX_PLATFORMS=axon) is for bench.py.
# Backends initialize lazily, so flipping jax.config before the first
# jax.devices() call overrides any TPU platform registered at interpreter
# start (the axon sitecustomize); XLA_FLAGS must be in the env by then too.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import pathlib

import pytest

DATA = pathlib.Path(__file__).parent / "data"


@pytest.fixture(scope="session")
def data_dir() -> pathlib.Path:
    return DATA


def load_histo_fixture(path) -> dict[int, int]:
    """Parse a reference .histo fixture: '<abundance>\\t<count>' lines."""
    out = {}
    with open(path) as f:
        for line in f:
            a, c = line.split()
            out[int(a)] = int(c)
    return out
