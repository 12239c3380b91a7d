"""Environment-driven paths (ref `settings.py` + `.env_template`).

Reads a ``.env`` file (tiny built-in loader — python-dotenv is not a
dependency) and environment variables.  Unlike the reference, missing
variables do not crash at import; paths resolve lazily so library use
never requires a data directory.

Env keys (same as the reference's `.env_template`):
  DATA_PATH_CITY / DATA_PATH_PASCAL / DATA_PATH_ADE / DATA_PATH_EM /
  DATA_PATH_COCO, SOURCE_DATA_PATH_* (raw downloads), LOG_DIR,
  RESULTS_DIR.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

_ENV_LOADED = False


def load_dotenv(path: str = ".env") -> None:
    global _ENV_LOADED
    if _ENV_LOADED:
        return
    _ENV_LOADED = True
    if not os.path.exists(path):
        return
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#") or "=" not in line:
                continue
            key, _, value = line.partition("=")
            value = value.strip().strip("'\"")
            os.environ.setdefault(key.strip(), value)


_DATA_ENV = {
    "cityscapes": "DATA_PATH_CITY",
    "pascal": "DATA_PATH_PASCAL",
    "ade": "DATA_PATH_ADE",
    "em": "DATA_PATH_EM",
    "coco": "DATA_PATH_COCO",
}


def data_path(data_type: str) -> str:
    load_dotenv()
    key = _DATA_ENV[data_type]
    path = os.environ.get(key, "")
    if not path:
        raise RuntimeError(
            f"{key} is not set; point it at the preprocessed {data_type} "
            "directory (see .env_template / README)")
    return path


def source_data_path(data_type: str) -> str:
    load_dotenv()
    return os.environ.get("SOURCE_" + _DATA_ENV[data_type], "")


def all_data_paths() -> Dict[str, Optional[str]]:
    load_dotenv()
    return {k: os.environ.get(v) or None for k, v in _DATA_ENV.items()}


def log_dir() -> str:
    load_dotenv()
    return os.environ.get("LOG_DIR", "logs")


def results_dir() -> str:
    load_dotenv()
    return os.environ.get("RESULTS_DIR", "results")
