import os

# Virtual 8-device CPU mesh for sharding tests; the real TPU is exercised by
# bench.py / __graft_entry__.py, not by unit tests.
# force CPU regardless of the ambient JAX_PLATFORMS (the driver environment
# pre-sets the TPU platform via sitecustomize, which wins over the env var;
# unit tests must not compile over the TPU tunnel)
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pathlib
import pytest

FIXTURES = pathlib.Path("/root/reference/util")


@pytest.fixture
def fq1() -> str:
    return str(FIXTURES / "test_1.fastq")


@pytest.fixture
def fq2() -> str:
    return str(FIXTURES / "test_2.fastq")


@pytest.fixture
def fa1() -> str:
    return str(FIXTURES / "test_1.fasta")


@pytest.fixture
def fa2() -> str:
    return str(FIXTURES / "test_2.fasta")


@pytest.fixture
def fq1_gz() -> str:
    return str(FIXTURES / "test_1.fastq.gz")


@pytest.fixture
def fq2_gz() -> str:
    return str(FIXTURES / "test_2.fastq.gz")
