"""Test harness: force an 8-device virtual CPU mesh before JAX backends init.

The container's sitecustomize pre-imports jax and registers the axon TPU
plugin, so plain ``JAX_PLATFORMS=cpu`` env vars are ineffective; instead we
flip the platform via jax.config before any backend is initialized.

Multi-chip sharding is validated on virtual CPU devices
(xla_force_host_platform_device_count) exactly as the driver's
dryrun_multichip does; real-TPU paths are exercised by bench.py.
"""
import os

if os.environ.get("VQVAE3D_TPU_TESTS") == "1":
    # tools/tpu_kernel_tests.py re-runs the TPU-gated test modules on the
    # real chip via pytest.main — don't flip the platform under it.
    import jax  # noqa: F401
else:
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + " --xla_force_host_platform_device_count=8"
        ).strip()

    import jax  # noqa: E402

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")

    assert jax.device_count() == 8, jax.devices()
