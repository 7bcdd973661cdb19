import os

# Tests run on a virtual 8-device CPU mesh: multi-chip sharding paths are
# validated without TPU hardware (the driver separately dry-runs them).
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
