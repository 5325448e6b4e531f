"""Persistent XLA compilation cache (core/compile_cache.py)."""

import os

import jax
import jax.numpy as jnp

from aigv_assessor_tpu.core import compile_cache


def _reset():
    compile_cache._ENABLED = False
    jax.config.update("jax_compilation_cache_dir", None)


def test_cache_writes_entries(tmp_path, monkeypatch):
    d = str(tmp_path / "jaxcache")
    monkeypatch.setenv("AIGV_COMPILE_CACHE", d)
    try:
        got = compile_cache.enable_compilation_cache()
        assert got == d
        # idempotent
        assert compile_cache.enable_compilation_cache() == d

        @jax.jit
        def f(x):
            return x * 2 + 1

        f(jnp.arange(16)).block_until_ready()
        assert os.path.isdir(d)
        assert len(os.listdir(d)) >= 1  # compiled executable persisted
    finally:
        _reset()


def test_cache_disabled(monkeypatch):
    monkeypatch.setenv("AIGV_COMPILE_CACHE", "0")
    try:
        assert compile_cache.enable_compilation_cache() is None
        assert compile_cache._ENABLED is False
    finally:
        _reset()
