import os

# force CPU with a virtual 8-device mesh for sharding tests
# (JAX_PLATFORMS env is overridden by the axon TPU plugin; the config API works)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platform_name", "cpu")

import pytest  # noqa: E402

REF_EXAMPLES = os.environ.get("READS_DIR",
                              "/root/reference/examples")


@pytest.fixture(scope="session")
def example_reads():
    paths = [os.path.join(REF_EXAMPLES, "reads_1.fastq.gz"),
             os.path.join(REF_EXAMPLES, "reads_2.fastq.gz")]
    if not all(os.path.exists(p) for p in paths):
        pytest.skip("reference example reads not available")
    return paths


@pytest.fixture(scope="session")
def merged_reads(example_reads):
    from plass_tpu.data.createdb import merge_reads
    sdb, hdb = merge_reads(example_reads)
    return sdb, hdb
