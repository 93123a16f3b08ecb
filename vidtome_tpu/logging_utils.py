"""Structured logging + stage timing.

The reference logs with bare ``[INFO]``/``[WARNING]`` prints (SURVEY.md §5);
this routes through the stdlib logging module (same visible format by
default, machine-parseable when configured) and adds a timing context for
per-stage latency counters.
"""

from __future__ import annotations

import contextlib
import logging
import sys
import time

_configured = False


def get_logger(name: str = "vidtome") -> logging.Logger:
    global _configured
    if not _configured:
        handler = logging.StreamHandler(sys.stdout)
        handler.setFormatter(logging.Formatter("[%(levelname)s] %(message)s"))
        root = logging.getLogger("vidtome")
        root.addHandler(handler)
        root.setLevel(logging.INFO)
        root.propagate = False
        _configured = True
    return logging.getLogger(name)


@contextlib.contextmanager
def timed(label: str, logger: logging.Logger | None = None):
    """Log wall-clock duration of a stage."""
    log = logger or get_logger()
    t0 = time.time()
    yield
    log.info("%s took %.2fs", label, time.time() - t0)


def collect_tome_stats(stats_collection) -> dict[str, dict]:
    """Flatten a 'tome_stats' variable collection into
    {block_path: {seq_len, merged_len, compression}} (the counterpart of the
    reference's collect_from_patch, patch.py:373-387)."""
    import jax

    out: dict[str, dict] = {}
    flat = jax.tree_util.tree_flatten_with_path(stats_collection)[0]
    tmp: dict[str, dict] = {}
    for path, value in flat:
        keys = [getattr(p, "key", str(p)) for p in path]
        block = "/".join(keys[:-1])
        leaf = keys[-1]
        tmp.setdefault(block, {})[leaf] = int(jax.device_get(value))
    for block, vals in tmp.items():
        if "seq_len" in vals and "merged_len" in vals and vals["seq_len"]:
            vals["compression"] = vals["merged_len"] / vals["seq_len"]
        out[block] = vals
    return out
