import os

# Tests run on a virtual 8-device CPU mesh so multi-chip sharding paths are
# validated without TPU hardware.  The environment force-sets
# JAX_PLATFORMS=axon (TPU tunnel) via sitecustomize, so setdefault is not
# enough: hard-select CPU before any backend initialization.
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

try:
    import jax

    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass
