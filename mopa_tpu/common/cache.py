"""Persistent XLA compilation cache.

This environment compiles through a remote service where large programs (the
fused train step) take tens of minutes; the on-disk cache makes every compile
one-time per (program, shapes) across processes. Call early, before the first
jit executes.
"""

import os
import os.path as osp

_DEFAULT = osp.join(osp.dirname(osp.dirname(osp.dirname(osp.abspath(__file__)))),
                    ".jax_cache")


def honor_platform_env():
    """Make ``JAX_PLATFORMS=cpu`` effective for CLI tools.

    The axon sitecustomize force-sets ``jax_platforms="axon,cpu"`` at
    interpreter start, silently overriding the env var — a tool launched with
    ``JAX_PLATFORMS=cpu`` would grab the TPU tunnel anyway (and contend with
    whatever holds the chip). Re-apply the env var through jax.config, the
    same way tests/conftest.py does.
    """
    want = os.environ.get("JAX_PLATFORMS", "")
    if want:
        import jax

        jax.config.update("jax_platforms", want)


def enable_compile_cache(path: str = None):
    honor_platform_env()

    import jax

    # CPU executables are AOT-compiled on the remote service with different
    # machine features than this host (SIGILL risk when reloaded), and local
    # CPU compiles are fast anyway — cache only the TPU backend.
    try:
        if jax.default_backend() != "tpu":
            return None
    except Exception:
        return None
    path = path or os.environ.get("MOPA_JAX_CACHE", _DEFAULT)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    return path
