"""Runtime/platform setup helpers.

``setup_compilation_cache`` enables JAX's persistent compilation cache —
essential on remote-compile TPU tunnels where a full SD UNet compile takes
minutes: the second process run reuses the compiled executable from disk.
"""

from __future__ import annotations

import os


def setup_compilation_cache(path: str | None = None) -> None:
    import jax

    path = path or os.environ.get("VIDTOME_CACHE_DIR",
                                  os.path.expanduser("~/.cache/vidtome_xla"))
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    if os.environ.get("VIDTOME_DEBUG_COMPILES"):
        jax.config.update("jax_explain_cache_misses", True)
