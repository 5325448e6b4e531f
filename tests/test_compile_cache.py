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
        assert got == d, (got, d)
        assert compile_cache.enable_compilation_cache() == d  # idempotent

        @jax.jit
        def f(x):
            return x * 2 + 1

        f(jnp.arange(16)).block_until_ready()
        assert os.path.isdir(d), d
        assert len(os.listdir(d)) >= 1  # compiled executable persisted
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
        os.environ["AIGV_COMPILE_CACHE"] = d1
        assert compile_cache.enable_compilation_cache() == d1
        jax.jit(lambda x: x + 1)(jnp.arange(8)).block_until_ready()

        os.environ["AIGV_COMPILE_CACHE"] = d2
        got = compile_cache.enable_compilation_cache()
        # Either the repoint succeeded (returns d2, entries land there) or
        # the build refused (returns d1) — never a lie.
        assert got in (d1, d2), got
        if got == d2:
            jax.jit(lambda x: x * 3)(jnp.arange(8)).block_until_ready()
            assert os.path.isdir(d2) and len(os.listdir(d2)) >= 1
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
