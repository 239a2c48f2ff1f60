"""Test rig: force a CPU backend with 8 virtual devices so multi-chip
sharding tests (parallel/) run without a pod — the fake-mesh strategy the
reference never needed (SURVEY.md §4, last bullet).

Note: this environment's sitecustomize force-registers the axon TPU plugin
and overrides the JAX_PLATFORMS env var, so the env var alone is NOT enough;
``jax.config.update`` after import is, provided it runs before any backend
initialization — hence at conftest import time.
"""

import os

# The native debug hook (acx_debug_set_counts) is runtime-gated: inert in
# production processes, live only under this opt-in (ADVICE r4).
os.environ.setdefault("ACX_TESTING", "1")

# Keep the suite hermetic: no persistent XLA cache writes from tests
# (utils/compile_cache.py; the cache's own test monkeypatches this).
os.environ.setdefault("ACX_COMPILE_CACHE", "off")

if "--xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
