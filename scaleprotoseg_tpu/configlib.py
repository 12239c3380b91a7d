"""Minimal gin-compatible configuration system.

The reference drives every experiment through gin-config files
(`segmentation/configs/*.gin`, parsed at `train_wandb_multiscale.py:328`;
see SURVEY.md §2.1).  gin is not available in this environment, so this
module implements the subset the framework needs with the same `.gin` file
syntax and the same decorator surface:

- ``@configurable`` / ``@configurable(allowlist=..., denylist=...)``
- ``parse_config_file(path)`` / ``parse_config(text)``
- ``REQUIRED`` sentinel that raises if a binding is missing
- ``operative_config()`` — flat dict of bindings actually consumed, the
  analog of the reference's ``get_operative_config_json``
  (`segmentation/config.py:19-28`).

Binding keys may be module-qualified (``pkg.mod.Класс.param``); resolution
uses the final ``name.param`` pair, matching how the shipped configs are
written.
"""

from __future__ import annotations

import ast
import functools
import inspect
import json
import threading
from typing import Any, Callable, Dict, Optional


class _RequiredSentinel:
    def __repr__(self):
        return "REQUIRED"


REQUIRED = _RequiredSentinel()

_lock = threading.RLock()
# configurable short name -> {param: value}
_BINDINGS: Dict[str, Dict[str, Any]] = {}
# bindings read during calls (for operative-config logging)
_OPERATIVE: Dict[str, Any] = {}
# registered configurable short names (for error messages)
_REGISTRY: Dict[str, Callable] = {}


class ConfigError(RuntimeError):
    pass


def clear_config() -> None:
    with _lock:
        _BINDINGS.clear()
        _OPERATIVE.clear()


def bind(name: str, param: str, value: Any) -> None:
    with _lock:
        _BINDINGS.setdefault(name, {})[param] = value


def query(name: str, param: str, default: Any = None) -> Any:
    with _lock:
        return _BINDINGS.get(name, {}).get(param, default)


def _parse_value(raw: str) -> Any:
    raw = raw.strip()
    try:
        return ast.literal_eval(raw)
    except (ValueError, SyntaxError):
        # gin macros / bare identifiers (e.g. TBD) surface as strings so the
        # consumer can fail with a readable message.
        return raw


def _strip_comment(line: str) -> str:
    out, in_str, quote = [], False, ""
    for ch in line:
        if in_str:
            out.append(ch)
            if ch == quote:
                in_str = False
        elif ch in ("'", '"'):
            in_str, quote = True, ch
            out.append(ch)
        elif ch == "#":
            break
        else:
            out.append(ch)
    return "".join(out)


def parse_config(text: str) -> None:
    """Parse gin-style ``a.b.c.param = value`` lines into the binding store."""
    buffered = ""
    for rawline in text.splitlines():
        line = _strip_comment(rawline).strip()
        if not line:
            continue
        buffered = f"{buffered} {line}" if buffered else line
        # Continuation: unbalanced brackets mean the value spans lines.
        if buffered.count("(") > buffered.count(")") or \
           buffered.count("[") > buffered.count("]"):
            continue
        stmt, buffered = buffered, ""
        if stmt.startswith(("import ", "include ")):
            continue
        if "=" not in stmt:
            raise ConfigError(f"Cannot parse config line: {stmt!r}")
        key, _, raw_value = stmt.partition("=")
        key = key.strip()
        parts = key.split(".")
        if len(parts) < 2:
            raise ConfigError(f"Binding key needs name.param form: {key!r}")
        name, param = parts[-2], parts[-1]
        bind(name, param, _parse_value(raw_value))


def parse_config_file(path: str) -> None:
    with open(path) as f:
        parse_config(f.read())


def _apply_bindings(name: str, func: Callable, allowlist, denylist,
                    args: tuple, kwargs: dict) -> dict:
    sig = inspect.signature(func)
    try:
        bound = sig.bind_partial(*args, **kwargs)
    except TypeError as e:
        raise TypeError(f"{name}: {e}") from e
    explicitly_set = set(bound.arguments)
    with _lock:
        bindings = dict(_BINDINGS.get(name, {}))
    out = dict(kwargs)
    for param, value in bindings.items():
        if param in explicitly_set:
            continue
        if allowlist is not None and param not in allowlist:
            continue
        if denylist is not None and param in denylist:
            continue
        if param not in sig.parameters:
            continue
        out[param] = value
        with _lock:
            _OPERATIVE[f"{name}.{param}"] = value
    # REQUIRED defaults must have been filled.
    for param, p in sig.parameters.items():
        if isinstance(p.default, _RequiredSentinel) and \
           param not in out and param not in explicitly_set:
            raise ConfigError(
                f"{name}.{param} is REQUIRED but no binding was provided")
    return out


def configurable(func: Optional[Callable] = None, *, name: Optional[str] = None,
                 allowlist=None, denylist=None):
    """Decorator making a function/class fill missing kwargs from bindings."""

    def wrap(f: Callable) -> Callable:
        cfg_name = name or f.__name__

        if inspect.isclass(f):
            orig_init = f.__init__

            @functools.wraps(orig_init)
            def init(self, *args, **kwargs):
                merged = _apply_bindings(cfg_name, orig_init, allowlist,
                                         denylist, (self,) + args, kwargs)
                orig_init(self, *args, **merged)

            f.__init__ = init
            _REGISTRY[cfg_name] = f
            return f

        @functools.wraps(f)
        def wrapper(*args, **kwargs):
            merged = _apply_bindings(cfg_name, f, allowlist, denylist,
                                     args, kwargs)
            return f(*args, **merged)

        _REGISTRY[cfg_name] = wrapper
        return wrapper

    if func is not None:
        return wrap(func)
    return wrap


def external_configurable(f: Callable, name: Optional[str] = None) -> Callable:
    return configurable(f, name=name)


def operative_config() -> Dict[str, Any]:
    """Flattened dict of consumed bindings (ref `config.py:19-28`)."""
    with _lock:
        return dict(_OPERATIVE)


def operative_config_json() -> str:
    return json.dumps(operative_config(), default=repr, indent=2)


def all_bindings() -> Dict[str, Dict[str, Any]]:
    with _lock:
        return {k: dict(v) for k, v in _BINDINGS.items()}
