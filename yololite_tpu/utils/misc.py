"""Auxiliary utilities: settings persistence, retry/guard decorators, thread locks.

Counterparts of reference utils/__init__.py:224-257 (ThreadingLocked), :713-776
(TryExcept/Retry), :798-969 (JSONDict/SettingsManager) -- the failure-tolerance
and persistence layer (SURVEY.md §5.2-5.3).
"""

from __future__ import annotations

import functools
import json
import threading
import time
from pathlib import Path
from typing import Any, Dict, Optional

from yololite_tpu.utils import LOGGER


def clean_str(s):
    """Replace special characters in a string with underscores (reference ops.py:491-503)."""
    import re

    return re.sub(pattern="[|@#!¡·$€%&()=?¿^*;:,¨´><+]", repl="_", string=s)


class TryExcept:
    """Context manager / decorator that logs exceptions instead of raising."""

    def __init__(self, msg: str = "", verbose: bool = True):
        self.msg = msg
        self.verbose = verbose

    def __call__(self, func):
        @functools.wraps(func)
        def wrapper(*args, **kwargs):
            with self:
                return func(*args, **kwargs)

        return wrapper

    def __enter__(self):
        return self

    def __exit__(self, exc_type, value, tb):
        if self.verbose and value:
            LOGGER.warning(f"{self.msg}{': ' if self.msg else ''}{value}")
        return True


def retry(times: int = 3, delay: float = 2.0):
    """Decorator retrying a function with exponential backoff (utils/__init__.py:751-776)."""

    def decorator(func):
        @functools.wraps(func)
        def wrapper(*args, **kwargs):
            attempt = 0
            while attempt < times:
                try:
                    return func(*args, **kwargs)
                except Exception as e:
                    attempt += 1
                    if attempt >= times:
                        raise
                    LOGGER.warning(f"Retry {attempt}/{times} for {func.__name__} after error: {e}")
                    time.sleep(delay * (2 ** (attempt - 1)))

        return wrapper

    return decorator


class ThreadingLocked:
    """Decorator serializing calls to a function across threads (utils/__init__.py:224-257)."""

    def __init__(self):
        self.lock = threading.Lock()

    def __call__(self, f):
        @functools.wraps(f)
        def decorated(*args, **kwargs):
            with self.lock:
                return f(*args, **kwargs)

        return decorated


class JSONDict(dict):
    """Thread-safe dict persisted to a JSON file on every mutation (utils/__init__.py:798-870)."""

    def __init__(self, file_path="data.json"):
        super().__init__()
        self.file_path = Path(file_path)
        self.lock = threading.Lock()
        self._load()

    def _load(self):
        try:
            if self.file_path.exists():
                with open(self.file_path) as f:
                    self.update(json.load(f))
        except Exception as e:
            LOGGER.warning(f"Error reading {self.file_path}: {e}")

    def _save(self):
        try:
            self.file_path.parent.mkdir(parents=True, exist_ok=True)
            with open(self.file_path, "w", encoding="utf-8") as f:
                json.dump(dict(self), f, indent=2, default=str)
        except Exception as e:
            LOGGER.warning(f"Error writing {self.file_path}: {e}")

    def __setitem__(self, key, value):
        with self.lock:
            super().__setitem__(key, value)
            self._save()

    def __delitem__(self, key):
        with self.lock:
            super().__delitem__(key)
            self._save()

    def update(self, *args, **kwargs):
        with self.lock:
            super().update(*args, **kwargs)
        self._save()

    def clear(self):
        with self.lock:
            super().clear()
            self._save()


class SettingsManager(JSONDict):
    """Persistent framework settings (datasets/weights/runs dirs; utils/__init__.py:873-969)."""

    def __init__(self, file=None, version="1.0.0"):
        root = Path.home() / ".config" / "yololite_tpu"
        file = Path(file) if file else root / "settings.json"
        self.defaults = {
            "settings_version": version,
            "datasets_dir": str(root.parent.parent / "datasets"),
            "weights_dir": str(root / "weights"),
            "runs_dir": str(root / "runs"),
            "sync": True,
        }
        super().__init__(file)
        if not self or self.get("settings_version") != version:
            merged = {**self.defaults, **self}
            merged["settings_version"] = version
            self.update(merged)

    def reset(self):
        self.clear()
        self.update(self.defaults)


SETTINGS: Optional[SettingsManager] = None


def get_settings() -> SettingsManager:
    """Lazily construct the global settings manager (no import-time side effects)."""
    global SETTINGS
    if SETTINGS is None:
        SETTINGS = SettingsManager()
    return SETTINGS
