"""AOT-serialized serving executables: compile once, start in seconds.

The unstacked serving layout's first compile is ~4 minutes (docs/PERF.md:
XLA inlines 16 per-block weight pytrees); jax's persistent compilation
cache only helps the host that did the compiling. This module serializes
the COMPILED executable itself (jax.experimental.serialize_executable —
a PJRT executable + arg trees, not StableHLO, so loading skips XLA
entirely) keyed by everything that invalidates it: jax/jaxlib version,
device kind + count, and the abstract signature of the call.

Reference parity anchor: the reference's load-and-go UX is
/root/reference/generate.py:122-146 (torch loads eagerly and pays no
compile); on TPU the compile is real, so shipping a warm artifact is the
equivalent UX. An artifact is strictly a cache: any load failure (version
bump, different chip, corrupt file) falls back to a fresh compile and
overwrites it.

Usage:
    runner = AotCache(dir).load_or_compile(
        jitted_fn, tag, args, kwargs, static={"num_gen_frames": 27})
    out = runner(*args, **kwargs)   # static kwargs already baked in
"""

from __future__ import annotations

import hashlib
import os
import pickle

import jax


def _abstract(x):
    """Stable per-leaf signature string."""
    a = jax.api_util.shaped_abstractify(x)
    return f"{a.shape}:{a.dtype}"


def signature_key(tag: str, args, kwargs, static: dict) -> str:
    """Hash of everything that must match for a serialized executable to be
    valid: versions, backend topology, and the abstract call signature."""
    leaves, treedef = jax.tree.flatten((args, kwargs))
    devs = jax.devices()
    parts = [
        f"jax={jax.__version__}",
        f"jaxlib={jax.lib.__version__}",
        f"backend={jax.default_backend()}",
        f"device={devs[0].device_kind}x{len(devs)}",
        f"tag={tag}",
        f"static={sorted(static.items())!r}",
        f"tree={treedef}",
        "leaves=" + ",".join(_abstract(x) for x in leaves),
    ]
    return hashlib.sha256("|".join(parts).encode()).hexdigest()[:24]


class AotCache:
    """Directory of serialized serving executables, one file per signature."""

    def __init__(self, cache_dir: str):
        self.dir = cache_dir
        # TRUST ASSUMPTION: artifacts are unpickled on load (inherent to
        # jax.experimental.serialize_executable), so aot_dir must be a
        # private, trusted directory — a pre-populated or attacker-writable
        # cache is arbitrary code execution. Create it owner-only.
        os.makedirs(cache_dir, mode=0o700, exist_ok=True)
        # load/compile/save events of this process, newest last — the
        # cold-start observability hook (tests + `gtax-generate --verbose`)
        self.events: list[tuple[str, str]] = []

    def _path(self, key: str) -> str:
        return os.path.join(self.dir, f"{key}.aotx")

    def load_or_compile(self, fn, tag: str, args, kwargs=None, static=None,
                        force_compile: bool = False):
        """fn: a jax.jit-wrapped callable. Returns a runner taking the same
        NON-STATIC (args, kwargs); static kwargs are baked into the
        executable (they select the compiled program, exactly as jit's
        static_argnames do). force_compile skips the artifact (the caller's
        escape hatch when a LOADED executable failed at call time — see
        gtax.serving._aot_call)."""
        kwargs = dict(kwargs or {})
        static = dict(static or {})
        key = signature_key(tag, args, kwargs, static)
        path = self._path(key)
        from jax.experimental.serialize_executable import (
            deserialize_and_load,
            serialize,
        )

        if os.path.exists(path) and not force_compile:
            try:
                with open(path, "rb") as f:
                    payload, in_tree, out_tree, n_dev = pickle.load(f)
                # deserialize defaults execution_devices to ALL backend
                # devices; the executable was compiled for n_dev (1 on the
                # single-chip serving path) — pass a matching slice
                compiled = deserialize_and_load(
                    payload, in_tree, out_tree,
                    execution_devices=jax.devices()[:n_dev])
                self.events.append(("load", path))
                return _Runner(compiled, from_cache=True)
            except Exception as e:  # stale jaxlib, other chip, corrupt file
                self.events.append(("load_failed", f"{path}: {e!r}"))
        compiled = fn.lower(*args, **kwargs, **static).compile()
        self.events.append(("compile", tag))
        try:
            payload, in_tree, out_tree = serialize(compiled)
            n_dev = len(compiled._executable.xla_executable.local_devices())
            tmp = path + f".tmp{os.getpid()}"
            with open(tmp, "wb") as f:
                pickle.dump((payload, in_tree, out_tree, n_dev), f)
            os.replace(tmp, path)
            self.events.append(("save", path))
        except Exception as e:  # serialization unsupported on this backend
            self.events.append(("save_failed", repr(e)))
        return _Runner(compiled)


class _Runner:
    """Uniform call wrapper over a jax Compiled: accepts the original
    (args, kwargs) minus statics — the Compiled's own calling convention.
    from_cache marks deserialized executables so callers can fall back to a
    fresh compile if one fails at CALL time (rare XLA AOT-loader runtime
    faults surface on execute, not on load)."""

    def __init__(self, compiled, from_cache=False):
        self.compiled = compiled
        self.from_cache = from_cache

    def __call__(self, *args, **kwargs):
        return self.compiled(*args, **kwargs)
