"""Shared JAX runtime setup: persistent compilation cache.

Bucketed descriptor kernels compile one executable per (A, K, chunk) shape;
the persistent cache makes repeat runs (tests, CLI invocations) skip XLA
compilation entirely.
"""

import os

import jax

_DONE = False


def setup_precision():
    """Enable float64 tracing (the reference's numerical semantics).

    Without `jax_enable_x64`, JAX silently downcasts the calculators'
    float64 inputs to float32 — on the CPU path that turns 1e-13 golden
    coefficient parity into ~1e-4 errors. The TPU fast path
    (`fitsnap_tpu.parallel.fit`) passes explicit float32 row dtypes and is
    unaffected. Opt out with FITSNAP_TPU_NO_X64=1.
    """
    if os.environ.get("FITSNAP_TPU_NO_X64") != "1":
        jax.config.update("jax_enable_x64", True)
    # TPU matmuls on f32 operands default to bf16-based passes; that was
    # the entire WBe accuracy gap (coeff diff vs the f64 golden: 0.28 ->
    # 1.05e-5 with full-f32 passes). Correctness first; override with
    # JAX_DEFAULT_MATMUL_PRECISION to trade it back.
    if not os.environ.get("JAX_DEFAULT_MATMUL_PRECISION"):
        jax.config.update("jax_default_matmul_precision", "highest")


def warm_transfers():
    """Start the remote relay's transfer warmup in the background.

    The first device->host transfer of a process pays a one-time ~minutes
    initialization through the remote-TPU relay (measured: 48 KB in 480 s,
    everything after in milliseconds). Kick a tiny round trip on a daemon
    thread so the cost overlaps host-side scraping and compiles instead of
    landing on the first real result fetch.
    """
    import threading

    def _warm():
        try:
            import jax as _jax
            import numpy as _np
            d = _jax.device_put(_np.ones((8,), _np.float32))   # upload path
            _np.asarray(d + 1.0)                               # download path
            # batch-scale upload: the relay pays a further one-time setup
            # on the first multi-megabyte transfer (~0.7 s measured); a
            # production-sized dummy here moves that under the scrape.
            big = _jax.device_put(_np.ones((1 << 20,), _np.float32))
            big.block_until_ready()
            del big
        except Exception:
            pass

    t = threading.Thread(target=_warm, daemon=True)
    t.start()
    return t


def setup_cache():
    global _DONE
    if _DONE:
        return
    cache_dir = os.environ.get(
        "FITSNAP_TPU_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "fitsnap_tpu_xla"))
    try:
        # namespace by backend: AOT executables are machine-specific and the
        # remote-compile TPU service must not share entries with host CPU
        cache_dir = os.path.join(cache_dir, jax.default_backend())
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass
    _DONE = True
