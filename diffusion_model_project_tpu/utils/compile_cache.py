"""Persistent-compilation-cache enablement that actually works here.

In this environment the ``JAX_COMPILATION_CACHE_DIR`` environment variable is
silently IGNORED (``jax.config.jax_compilation_cache_dir`` stays ``None`` —
the same trap as ``JAX_PLATFORMS``, see CLAUDE.md): only
``jax.config.update("jax_compilation_cache_dir", ...)`` enables the cache.
Round 2's driver bench capture timed out on a cold compile precisely because
every CLI set only the env var. All CLIs now call :func:`enable_compile_cache`
right after importing jax.
"""
import os


def enable_compile_cache(path: str | None = None, *,
                         min_compile_time_secs: float = 1.0) -> str:
    """Enable the persistent compile cache at ``path``.

    Resolution order: explicit ``path`` arg > ``JAX_COMPILATION_CACHE_DIR``
    env var > the repo-local ``.jax_cache/`` next to the package (which
    survives between a builder session that pre-warms it and a later driver
    run — /tmp need not). A cache dir that is ALREADY configured in-process
    (e.g. tests/conftest.py's pytest cache before a CLI main() is invoked
    in-process) is respected and returned unchanged unless ``path`` is
    explicit. Returns the directory used.
    """
    import jax

    if path is None and jax.config.jax_compilation_cache_dir is not None:
        return jax.config.jax_compilation_cache_dir
    if path is None:
        path = os.environ.get("JAX_COMPILATION_CACHE_DIR")
    if path is None:
        path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      float(min_compile_time_secs))
    return path
