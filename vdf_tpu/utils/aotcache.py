"""Process-portable ahead-of-time executable cache for the big jits.

WHY: the environment's XLA persistent compilation cache
(``jax_compilation_cache_dir``) misses across processes for the large
TPU executables on this backend (observed: the same fold executable
re-compiled for ~6 minutes in every fresh process while its 34 MB cache
entry sat on disk under a different key — the backend contributes an
unstable component to the key).  A benchmark or driver process that
pays two of those compiles blows any timebox, which is exactly what
destroyed the round-4 bench artifact.

This cache sidesteps the problem with ``jax.experimental.
serialize_executable``: compiled executables are pickled to disk under
a key WE control — executable name + arg shapes/dtypes + a hash of the
whole ``vdf_tpu`` source tree + jax version + device kind.  A fresh
process deserializes and runs in seconds.  Any source edit changes the
code hash and invalidates every entry (conservative but safe: a stale
executable would silently compute old semantics).

Scope: single-chip executables only (a serialized executable pins its
device assignment; the mesh/TP path keeps plain ``jax.jit``).  Any
failure — missing API, corrupt entry, unpicklable tree — falls back to
plain ``jax.jit`` dispatch.
"""

from __future__ import annotations

import hashlib
import os
import pickle
import threading

import jax

_DIR = os.environ.get("VDF_TPU_AOT_CACHE", "/root/.vdf_aot_cache")
_CODE_HASH: str | None = None
_HASH_LOCK = threading.Lock()


def _code_hash() -> str:
    """Hash of every .py/.cpp under vdf_tpu/ (sorted walk, content bytes)."""
    global _CODE_HASH
    with _HASH_LOCK:
        if _CODE_HASH is None:
            h = hashlib.sha256()
            root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
            for dirpath, dirnames, filenames in os.walk(root):
                dirnames[:] = sorted(d for d in dirnames if d != "__pycache__")
                for fn in sorted(filenames):
                    if fn.endswith((".py", ".cpp", ".h")):
                        p = os.path.join(dirpath, fn)
                        h.update(os.path.relpath(p, root).encode())
                        with open(p, "rb") as fh:
                            h.update(fh.read())
            _CODE_HASH = h.hexdigest()[:16]
    return _CODE_HASH


def enabled() -> bool:
    """TPU-only: serialized executables pin device assignment, and the
    CPU test lanes' XLA persistent cache behaves."""
    if os.environ.get("VDF_TPU_AOT_CACHE_DISABLE"):
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


class AotJit:
    """Callable wrapper: per argument signature, loads a serialized
    executable if present, else compiles and stores one.  Subsequent
    calls with the same signature dispatch straight to the compiled
    executable."""

    def __init__(self, name: str, fn):
        self.name = name
        self.fn = fn
        self._comps: dict = {}
        self._lock = threading.Lock()

    @staticmethod
    def _sig(args) -> str:
        import jax.tree_util as jtu

        leaves = jtu.tree_leaves(args)
        return ";".join(
            f"{tuple(l.shape)}/{l.dtype}" if hasattr(l, "shape") else repr(l)
            for l in leaves
        )

    def _key_path(self, sig: str) -> str | None:
        try:
            dev = jax.devices()[0]
            key_src = "|".join(
                (
                    self.name,
                    sig,
                    _code_hash(),
                    jax.__version__,
                    dev.platform,
                    str(getattr(dev, "device_kind", "")),
                )
            )
            key = hashlib.sha256(key_src.encode()).hexdigest()[:32]
            safe = self.name.replace("/", "_")
            return os.path.join(_DIR, f"{safe}-{key}.aot")
        except Exception:
            return None

    def _build(self, sig, args):
        path = self._key_path(sig) if enabled() else None
        if path is not None and os.path.exists(path):
            try:
                from jax.experimental import serialize_executable

                with open(path, "rb") as fh:
                    ser, in_tree, out_tree = pickle.loads(fh.read())
                return serialize_executable.deserialize_and_load(
                    ser, in_tree, out_tree
                )
            except Exception:
                pass  # corrupt / stale entry: recompile below
        jitted = jax.jit(self.fn)
        if path is None:
            return jitted
        try:
            comp = jitted.lower(*args).compile()
        except Exception:
            return jitted
        try:
            from jax.experimental import serialize_executable

            os.makedirs(_DIR, exist_ok=True)
            blob = pickle.dumps(serialize_executable.serialize(comp))
            tmp = f"{path}.tmp{os.getpid()}"
            with open(tmp, "wb") as fh:
                fh.write(blob)
            os.replace(tmp, path)
        except Exception:
            pass  # cache write is best-effort
        return comp

    def __call__(self, *args):
        try:
            sig = self._sig(args)
        except Exception:
            sig = None
        comp = self._comps.get(sig)
        if comp is None:
            with self._lock:
                comp = self._comps.get(sig)
                if comp is None:
                    comp = self._build(sig, args) if sig else jax.jit(self.fn)
                    self._comps[sig] = comp
        return comp(*args)


def aot_jit(name: str, fn) -> AotJit:
    """Drop-in for ``jax.jit(fn)`` on shape-monomorphic hot executables."""
    return AotJit(name, fn)
