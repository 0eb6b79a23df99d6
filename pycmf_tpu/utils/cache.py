"""Persistent XLA compilation cache helper.

On the remote-compile TPU link used here, even a trivial kernel can sit in
the compile queue for minutes (measured: 76 s for a one-matmul jit, 0.3 s
on the second process with the cache enabled). The persistent cache turns
every repeated (harness, test, bench) run's compiles into disk hits, on
both the TPU and CPU backends.

Opt-in by harnesses — the library never mutates global JAX config on
import (sklearn-style libraries must not). ``PYCMF_TPU_CACHE_DIR``
overrides the location; ``PYCMF_TPU_CACHE=0`` disables.
"""
from __future__ import annotations

import os


def _host_key() -> str:
    """Short hash of the host CPU's model name AND feature flags.

    XLA:CPU AOT results embed the compile machine's features; this VM can
    be rescheduled onto hosts with different CPUs (observed: cached
    binaries loading with 'machine type mismatch ... could lead to SIGILL'
    warnings, and one python segfault in libgcc unwinding mid-run).
    Keying the default cache dir on the host identity makes a migrated VM
    start a fresh cache instead of executing foreign binaries.

    The model name must be part of the key: LLVM derives tuning features
    (e.g. +prefer-no-scatter/+prefer-no-gather on some AVX512 parts) from
    the CPU MODEL, so two hosts with identical cpuinfo `flags` lines can
    still produce — and refuse to load — each other's AOT results.

    The numeric family/model/stepping lines must be part of the key TOO:
    virtualized hosts report a GENERIC marketing name ("Intel(R) Xeon(R)
    Processor @ 2.10GHz") that is identical across different
    microarchitectures, and a migrated VM was observed (round 3) loading
    a prior host's AOT results with "machine type mismatch ... could
    lead to SIGILL" warnings despite the model-name+flags key matching.
    CPUID family/model/stepping is what LLVM's host detection actually
    keys its tuning on.

    NOTE: 'machine type mismatch' warnings naming ONLY +prefer-no-scatter
    / +prefer-no-gather are a benign XLA false positive — those are LLVM
    tuning preferences, not CPUID flags, so the AOT loader's feature check
    fails on them even when a host reloads its OWN cache (verified: fresh
    dir, two same-host processes, warning on the second). A genuinely
    foreign cache warns about real ISA features (and can SIGILL); that is
    what this key prevents.
    """
    try:
        import hashlib

        model = flags = fam = mnum = step = ""
        with open("/proc/cpuinfo") as f:
            for line in f:
                if not model and line.startswith("model name"):
                    model = line
                elif not flags and line.startswith("flags"):
                    flags = line
                elif not fam and line.startswith("cpu family"):
                    fam = line
                elif not mnum and line.startswith("model\t"):
                    mnum = line
                elif not step and line.startswith("stepping"):
                    step = line
                if model and flags and fam and mnum and step:
                    break
        ident = model + flags + fam + mnum + step
        if ident:
            return hashlib.sha1(ident.encode()).hexdigest()[:10]
    except OSError:
        pass
    return "generic"


def enable_persistent_cache(path: str | None = None) -> str | None:
    """Enable JAX's persistent compilation cache. Returns the dir used,
    or None when disabled/unavailable."""
    if os.environ.get("PYCMF_TPU_CACHE", "1").strip().lower() in (
            "0", "false", ""):
        return None
    import jax

    path = (path or os.environ.get("PYCMF_TPU_CACHE_DIR")
            or os.path.join(os.path.expanduser("~"), ".cache",
                            "pycmf_tpu", f"xla-{_host_key()}"))
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # Cache every compile: the remote queue makes even tiny compiles
        # expensive, and CPU-side shard_map test compiles add up too.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # noqa: BLE001 — cache is best-effort, never fatal
        return None
    return path
