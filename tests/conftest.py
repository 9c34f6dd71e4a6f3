import os

# Tests run on a virtual 8-device CPU mesh (the TPU-world "fake backend").
# The container's sitecustomize pre-imports jax and registers the axon TPU
# plugin, so plain env vars are too late — override through jax.config
# before any backend is initialized.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# fp32-exact matmuls so numeric parity tolerances are meaningful
jax.config.update("jax_default_matmul_precision", "highest")
