"""Persistent XLA compile-cache setup shared by all CLI entry points.

Compilation is the dominant cold-start cost in this environment (~20-200 s
for a jitted render/track program); the reference's CUDA kernels are
precompiled wheels so it never pays it (/root/reference/main.py has no
equivalent). Caching compiled executables on disk gives the same
run-it-again-instantly experience.

Two subtleties (docs/PERF.md rule 6):
  * XLA:CPU persists AOT executables whose code depends on the host's ISA
    feature set; an entry written on one container host can SIGILL on
    another. The CPU cache dir is therefore keyed by a hash of
    /proc/cpuinfo flags.
  * The TPU (axon) backend shares one cache dir; entries are keyed by
    program + compile options, so mixing runs is safe.
"""

from __future__ import annotations

import hashlib
from pathlib import Path

_REPO = Path(__file__).resolve().parents[2]


def _cpu_key() -> str:
    # Key by the WHOLE first-cpu cpuinfo stanza plus jax AND jaxlib
    # versions: XLA's AOT target features include tuning flags
    # (e.g. prefer-no-scatter) derived from model/stepping/LLVM-version
    # details that two hosts with identical cpuinfo `flags` lines can
    # still disagree on — observed as cpu_aot_loader
    # machine-feature-mismatch warnings when only flags+model were hashed.
    import jax
    import jaxlib

    try:
        with open("/proc/cpuinfo") as f:
            stanza = f.read().split("\n\n", 1)[0]
        ident = stanza + jax.__version__ + getattr(jaxlib, "__version__", "")
        return hashlib.sha1(ident.encode()).hexdigest()[:8]
    except OSError:
        return "nohost"


def enable_compile_cache() -> None:
    """Point jax at the repo's persistent compile cache (idempotent).

    Call after deciding the backend (i.e. after any JAX_PLATFORMS /
    jax.config platform selection) and before the first compilation.

    CPU caveat: the persistent cache forces XLA:CPU through its AOT
    serialize/deserialize path, which segfaulted the test suite twice on
    this infrastructure (jax 0.8.x: crashes inside
    `put_executable_and_time` / `backend_compile_and_load`; the
    `cpu_aot_loader` machine-feature-mismatch warnings suggest the VM's
    virtualized /proc/cpuinfo cannot key host identity reliably, so even
    a per-host dir does not quarantine entries). The CPU cache is
    therefore OFF unless GSLAM_CPU_CACHE=1 — opt in only for repeated
    same-process-config CPU runs where a crash is an acceptable trade
    for skipping a multi-minute compile. The TPU (axon) cache has been
    stable and stays on.
    """
    import os

    import jax

    if jax.default_backend() == "cpu":
        if os.environ.get("GSLAM_CPU_CACHE") != "1":
            return
        cache = _REPO / ".jax_cache_cpu" / _cpu_key()
    else:
        cache = _REPO / ".jax_cache"
    jax.config.update("jax_compilation_cache_dir", str(cache))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
