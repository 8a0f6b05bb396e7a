import os

# Force the CPU backend with 8 virtual devices so multi-chip sharding logic
# is exercised without TPU hardware. The environment pre-sets
# JAX_PLATFORMS=axon (the TPU tunnel), so this must override, not default.
# Must run before the first jax import.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
