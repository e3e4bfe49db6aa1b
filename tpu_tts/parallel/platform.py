"""Platform / distributed initialization helpers.

`TPU_TTS_PLATFORM=cpu|tpu|axon` pins the JAX backend *programmatically* —
needed because some environments register a TPU plugin in `sitecustomize`
and re-pin `jax_platforms` after env vars are read, so `JAX_PLATFORMS=cpu`
alone is not honored. Call `maybe_force_platform()` before any jax use in
CLI entry points.
"""

import os


def maybe_force_platform() -> None:
    plat = os.environ.get("TPU_TTS_PLATFORM")
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)
    maybe_enable_compile_cache()


def default_compile_cache_dir() -> str:
    """Per-user default (a world-shared fixed /tmp path would let another
    user pre-create it unwritable, or tamper with cached executables this
    process would deserialize)."""
    import tempfile

    return os.path.join(
        tempfile.gettempdir(), f"tpu_tts_jax_cache_{os.getuid()}"
    )


def maybe_enable_compile_cache() -> None:
    """Persistent XLA compile cache for every entry point — CLIs, bench.py
    and the scripts/ benchmarks all share ONE directory so a warm-up run from
    any of them warms the rest (disable with `TPU_TTS_COMPILE_CACHE=0`; dir
    via `TPU_TTS_COMPILE_CACHE_DIR`, default `default_compile_cache_dir()`).

    First compiles of full-size models take minutes (remote-compile TPU
    tunnel, or XLA:CPU); a re-run of the same program shape loads the cached
    executable instead. Writes are atomic, so concurrent multi-process ranks
    can safely share the directory (staggered ranks and re-runs get hits;
    simultaneous identical first compiles all miss). Cache setup is
    best-effort: an unwritable dir must never fail a training run — but it
    warns, so a bad TPU_TTS_COMPILE_CACHE_DIR doesn't silently re-pay the
    multi-minute compile every run."""
    if os.environ.get("TPU_TTS_COMPILE_CACHE", "1") == "0":
        return
    import jax

    cache_dir = os.environ.get("TPU_TTS_COMPILE_CACHE_DIR", default_compile_cache_dir())
    try:
        os.makedirs(cache_dir, mode=0o700, exist_ok=True)
        # makedirs(exist_ok=True) ignores `mode` for a PRE-EXISTING dir: on a
        # sticky world-writable /tmp another user can pre-create the
        # predictable path and later swap cached executables this process
        # would deserialize. Refuse dirs we don't own or that others can
        # write (the cache is an optimization — failing closed just means
        # recompiling).
        if os.path.islink(cache_dir):
            # a pre-created symlink would pass the (following) stat check
            # while pointing writes at an attacker-chosen location
            raise PermissionError("is a symlink")
        st = os.lstat(cache_dir)
        if st.st_uid != os.getuid() or (st.st_mode & 0o022):
            raise PermissionError(
                f"not owned by uid {os.getuid()} or group/world-writable "
                f"(uid={st.st_uid}, mode={oct(st.st_mode & 0o777)})"
            )
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # respect an explicit user setting of the min-compile-time knob
        if "JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS" not in os.environ:
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception as e:
        import warnings

        warnings.warn(
            f"persistent compile cache disabled ({cache_dir}: {e}) — every "
            "run will re-pay full XLA compiles; fix TPU_TTS_COMPILE_CACHE_DIR "
            "or set TPU_TTS_COMPILE_CACHE=0 to silence"
        )


def maybe_init_distributed() -> None:
    """Initialize jax.distributed iff launched by `tpu_tts.bin.distribute`
    (the `TPU_TTS_COORDINATOR` env triple) — no-op for plain single-process
    runs, so CLI entry points can call this unconditionally."""
    if os.environ.get("TPU_TTS_COORDINATOR"):
        init_distributed()


def init_distributed(coordinator_address=None, num_processes=None, process_id=None) -> None:
    """Multi-host init (the moral replacement for the reference's
    `trainer.distribute` + TTS/utils/distribute.py:13 NCCL setup).

    Explicit args win; otherwise the `TPU_TTS_COORDINATOR` /
    `TPU_TTS_NUM_PROCESSES` / `TPU_TTS_PROCESS_ID` env set by
    `python -m tpu_tts.bin.distribute` is used; with neither, JAX's own
    cluster auto-detection runs (TPU pod metadata)."""
    import jax

    if coordinator_address is None and os.environ.get("TPU_TTS_COORDINATOR"):
        coordinator_address = os.environ["TPU_TTS_COORDINATOR"]
        num_processes = int(os.environ["TPU_TTS_NUM_PROCESSES"])
        process_id = int(os.environ["TPU_TTS_PROCESS_ID"])
    kwargs = {}
    if coordinator_address:
        kwargs = dict(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    jax.distributed.initialize(**kwargs)
