"""Persistent XLA compilation cache bring-up.

The reference has no analog (torch eager recompiles nothing), but on TPU
every jitted program is XLA-compiled per process — the 7B forward takes
minutes to compile on a fresh process, which turns restarts, preemptions,
and multi-stage eval pipelines (infer -> grid_search -> evaluate, each a
new process, scripts/inference/*.sh) into compile marathons.

JAX ships a persistent on-disk cache keyed by (HLO, compiler flags,
topology); enabling it makes the second process's compile a disk read.
`enable()` is called by every CLI entry (aha_tpu/cli/) and by bench.py:

  * cache dir: $AHA_COMPILE_CACHE_DIR, else ~/.cache/aha_tpu/xla
  * disable with AHA_COMPILE_CACHE=0
  * only programs that took >1 s to compile are persisted (tiny-program
    writes would bloat the cache for no win)

Multi-host: every process may point at the same (network) dir — entries
are content-addressed and written atomically, so concurrent writers are
safe; jax only reads entries whose key matches exactly.
"""

from __future__ import annotations

import os


def enable(cache_dir: str | None = None) -> str | None:
    """Turn on the persistent compilation cache. Returns the directory in
    use, or None when disabled (AHA_COMPILE_CACHE=0 or jax too old).

    Safe to call multiple times and before/after backend init; jax reads
    these config values at compile time, not at import."""
    if os.environ.get("AHA_COMPILE_CACHE", "1") in ("0", "false", "no"):
        return None
    path = (cache_dir or os.environ.get("AHA_COMPILE_CACHE_DIR")
            or os.path.join(os.path.expanduser("~"), ".cache", "aha_tpu", "xla"))
    try:
        import jax

        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # >1 s to compile before persisting (the jax 0.9 default, pinned
        # here so a future default change can't silently bloat the cache
        # with tiny programs)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except (ImportError, AttributeError, OSError):
        # older jax without the knob, or an unwritable cache dir — compile
        # normally rather than fail the entry point
        return None
    return path
