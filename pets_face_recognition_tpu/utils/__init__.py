"""Config system and small shared helpers.

Behavioral parity target: the reference's executable-Python config contract
(``/root/reference/utils/__init__.py:13-72``): a config is a plain ``.py`` file executed
as a module; every public (non-underscore) module-level name becomes a config entry,
accessible both as attribute and as item.  Entry points receive one ``--config`` path and
everything else — model factory, loss factory, optimizer factory, dataloaders, metric
knobs — comes out of the config object.

Differences from the reference (deliberate, TPU-first):
- no global singleton mutation side channel is *required* (``Config`` retains the
  singleton behavior for API parity, but framework code only relies on the returned
  wrapper);
- device configuration is expressed as a mesh spec (``mesh_shape``/``mesh_axes``)
  instead of CUDA device strings.
"""

from __future__ import annotations

import importlib.util
import os
import sys
import uuid
from pathlib import Path
from typing import Any, Mapping


class DictWrapper:
    """Hybrid attribute/item read-write view over a dict.

    Parity: reference ``DictWrapper`` (``utils/__init__.py:13-50``) — supports
    ``cfg.key``, ``cfg['key']``, ``in``, ``.get``, iteration, and assignment.
    """

    def __init__(self, data: Mapping[str, Any] | None = None):
        object.__setattr__(self, "_data", dict(data or {}))

    # -- mapping protocol -------------------------------------------------
    def __getitem__(self, key: str) -> Any:
        return self._data[key]

    def __setitem__(self, key: str, value: Any) -> None:
        self._data[key] = value

    def __contains__(self, key: str) -> bool:
        return key in self._data

    def __iter__(self):
        return iter(self._data)

    def __len__(self) -> int:
        return len(self._data)

    def keys(self):
        return self._data.keys()

    def values(self):
        return self._data.values()

    def items(self):
        return self._data.items()

    def get(self, key: str, default: Any = None) -> Any:
        return self._data.get(key, default)

    # -- attribute protocol ----------------------------------------------
    def __getattr__(self, key: str) -> Any:
        try:
            return self._data[key]
        except KeyError as e:  # pragma: no cover - error path
            raise AttributeError(key) from e

    def __setattr__(self, key: str, value: Any) -> None:
        self._data[key] = value

    def __repr__(self) -> str:  # pragma: no cover - debugging aid
        return f"{type(self).__name__}({sorted(self._data)})"

    def to_dict(self) -> dict:
        return dict(self._data)


class Config(DictWrapper):
    """Singleton config: repeated construction returns the same instance.

    Parity: reference singleton ``Config`` (``utils/__init__.py:41-50``); the instance
    is reset by each :func:`get_config` call so one process can load several configs
    sequentially (the eval scripts rely on this).
    """

    _instance: "Config | None" = None

    def __new__(cls, data: Mapping[str, Any] | None = None):
        if cls._instance is None:
            cls._instance = super().__new__(cls)
            DictWrapper.__init__(cls._instance, {})
        if data:
            cls._instance._data.update(data)
        return cls._instance

    def __init__(self, data: Mapping[str, Any] | None = None):
        # __new__ already merged `data`; avoid DictWrapper.__init__ wiping state.
        pass

    @classmethod
    def reset(cls) -> None:
        cls._instance = None


def _exec_config_module(path: str | os.PathLike):
    """Execute a Python file as an anonymous module and return it."""
    path = Path(path).resolve()
    if not path.exists():
        raise FileNotFoundError(f"config file not found: {path}")
    # Unique module name so repeated loads of sibling configs don't collide.
    name = f"_pfr_config_{path.stem}_{uuid.uuid4().hex[:8]}"
    spec = importlib.util.spec_from_file_location(name, str(path))
    module = importlib.util.module_from_spec(spec)
    sys.modules[name] = module
    try:
        spec.loader.exec_module(module)
    finally:
        sys.modules.pop(name, None)
    return module


def _public_globals(module) -> dict:
    return {
        k: v
        for k, v in vars(module).items()
        if not k.startswith("_") and not isinstance(v, type(importlib))
    }


def get_dict_wrapper(path: str | os.PathLike) -> DictWrapper:
    """Load a config file into a plain (non-singleton) :class:`DictWrapper`.

    Parity: reference ``get_dict_wrapper`` (``utils/__init__.py:53-60``).
    """
    module = _exec_config_module(path)
    wrapper = DictWrapper(_public_globals(module))
    wrapper["config_path"] = str(Path(path).resolve())
    return wrapper


def get_config(path: str | os.PathLike) -> Config:
    """Load a config file into the singleton :class:`Config` (reset first).

    Parity: reference ``get_config`` (``utils/__init__.py:63-72``).
    """
    Config.reset()
    module = _exec_config_module(path)
    cfg = Config(_public_globals(module))
    cfg["config_path"] = str(Path(path).resolve())
    return cfg


def enable_compilation_cache(path: str | os.PathLike | None = None) -> None:
    """Enable JAX's persistent compilation cache.

    The TPU backend in this environment compiles remotely (~minutes for the big
    detection graphs); caching compiled executables across processes makes bench
    and entry-point reruns start in seconds.
    """
    import jax

    cache_dir = Path(path) if path else Path.home() / ".cache" / "pfr_jax_cache"
    cache_dir.mkdir(parents=True, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", str(cache_dir))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # pragma: no cover - older jax flag names
        pass


def is_main_process() -> bool:
    """True on the process that should own logging / run-dir IO.

    Parity: reference ``is_main_process`` (``utils/__init__.py:110-111``) keyed off
    ``NODE_RANK``/``LOCAL_RANK``; the JAX-native criterion is process index 0, with the
    env vars honored when JAX isn't initialized yet.
    """
    try:
        import jax

        return jax.process_index() == 0
    except Exception:  # pragma: no cover - pre-init fallback
        return os.environ.get("NODE_RANK", "0") == "0" and (
            os.environ.get("LOCAL_RANK", "0") == "0"
        )
