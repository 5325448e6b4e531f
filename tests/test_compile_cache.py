"""Persistent XLA compilation cache (core/compile_cache.py).

The cache-writes test runs in a SUBPROCESS: JAX's compilation-cache config
is process-global and whichever test initializes it first wins, so an
in-process assertion is only hermetic when this file runs alone (the
round-3 full-suite flake).
"""

import os
import subprocess
import sys
import textwrap

from aigv_assessor_tpu.core import compile_cache


def test_cache_writes_entries(tmp_path):
    d = str(tmp_path / "jaxcache")
    prog = textwrap.dedent(
        """
        import os, sys
        import jax, jax.numpy as jnp
        from aigv_assessor_tpu.core import compile_cache

        d = sys.argv[1]
        got = compile_cache.enable_compilation_cache()
        # the requested root gains a host-fingerprint subdir (XLA:CPU AOT
        # executables are host-feature-specialized; see compile_cache.py)
        assert got == os.path.join(d, compile_cache._host_fingerprint()), got
        assert compile_cache.enable_compilation_cache() == got  # idempotent

        @jax.jit
        def f(x):
            return x * 2 + 1

        f(jnp.arange(16)).block_until_ready()
        assert os.path.isdir(got), got
        assert len(os.listdir(got)) >= 1  # compiled executable persisted
        """
    )
    env = dict(os.environ, AIGV_COMPILE_CACHE=d, JAX_PLATFORMS="cpu")
    res = subprocess.run(
        [sys.executable, "-c", prog, d],
        env=env,
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert res.returncode == 0, res.stderr


def test_cache_disabled(monkeypatch):
    monkeypatch.setenv("AIGV_COMPILE_CACHE", "0")
    assert compile_cache.enable_compilation_cache() is None


def test_repoint_returns_dir_in_use(tmp_path):
    """After init, a different AIGV_COMPILE_CACHE must not be reported as
    active unless the cache was actually repointed (ADVICE round 3)."""
    prog = textwrap.dedent(
        """
        import os, sys
        import jax, jax.numpy as jnp
        from aigv_assessor_tpu.core import compile_cache

        d1, d2 = sys.argv[1], sys.argv[2]
        fp = compile_cache._host_fingerprint()
        p1, p2 = os.path.join(d1, fp), os.path.join(d2, fp)
        os.environ["AIGV_COMPILE_CACHE"] = d1
        assert compile_cache.enable_compilation_cache() == p1
        jax.jit(lambda x: x + 1)(jnp.arange(8)).block_until_ready()

        os.environ["AIGV_COMPILE_CACHE"] = d2
        got = compile_cache.enable_compilation_cache()
        # Either the repoint succeeded (returns p2, entries land there) or
        # the build refused (returns p1) — never a lie.
        assert got in (p1, p2), got
        if got == p2:
            jax.jit(lambda x: x * 3)(jnp.arange(8)).block_until_ready()
            assert os.path.isdir(p2) and len(os.listdir(p2)) >= 1
        """
    )
    d1, d2 = str(tmp_path / "c1"), str(tmp_path / "c2")
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("AIGV_COMPILE_CACHE", None)
    res = subprocess.run(
        [sys.executable, "-c", prog, d1, d2],
        env=env,
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert res.returncode == 0, res.stderr


def test_fingerprint_varies_with_cpu_features(monkeypatch, tmp_path):
    """Hosts with different CPU feature flags must land in different cache
    dirs: XLA:CPU AOT executables are feature-specialized and loading a
    foreign one segfaults at deserialization (observed in-round)."""
    fake = tmp_path / "cpuinfo"
    fake.write_text("processor: 0\nflags\t\t: fpu sse sse2 avx\n")
    real_open = open

    def fake_open(path, *a, **k):
        if path == "/proc/cpuinfo":
            return real_open(fake, *a, **k)
        return real_open(path, *a, **k)

    import builtins

    fp_real = compile_cache._host_fingerprint()
    monkeypatch.setattr(builtins, "open", fake_open)
    fp_fake = compile_cache._host_fingerprint()
    assert fp_fake != fp_real
    # stable under repeated reads of the same host
    assert fp_fake == compile_cache._host_fingerprint()


def test_default_disabled_on_cpu_backend(tmp_path):
    """With no explicit AIGV_COMPILE_CACHE, the cache must stay OFF on the
    CPU backend: XLA:CPU AOT entries can fail the loader's machine-feature
    check even on the writing host (SIGILL/SIGSEGV risk)."""
    prog = textwrap.dedent(
        """
        import os
        os.environ.pop("AIGV_COMPILE_CACHE", None)
        from aigv_assessor_tpu.core import compile_cache
        assert compile_cache.enable_compilation_cache() is None
        """
    )
    # PYTHONPATH drops any TPU-plugin sitecustomize (it materializes the
    # platform list before env vars apply — same trick as run_tests.sh)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=repo)
    env.pop("AIGV_COMPILE_CACHE", None)
    res = subprocess.run(
        [sys.executable, "-c", prog], env=env, capture_output=True,
        text=True, timeout=300,
    )
    assert res.returncode == 0, res.stderr
