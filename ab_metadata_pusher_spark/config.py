"""Scoped configuration with env-var fallbacks.

Re-expresses the reference's HOCON scoped-namespace config system
(reference: job/sample_mysql_aws_sqs_job.py:47-72 builds a flat
``scope.key`` -> value dict; job/customized_job.py:37-38 slices it per
component via ``Scoped.get_scoped_conf``; publisher merges per-component
defaults with ``with_fallback`` at publisher/aws_sqs_csv_puiblisher.py:70).

pyhocon is not a baked-in dependency here, so the same semantics are
provided over plain dicts: dotted keys, ``scoped()`` slicing, defaults
merging, and ``from_env`` for the reference's env-var contract
(reference: README.md:39-48, job/sample_mysql_aws_sqs_job.py:21-32).
"""

from __future__ import annotations

import logging
import logging.config
import os
import sys
from collections.abc import Mapping
from typing import Any

__all__ = ["ScopedConfig", "configure_logging", "env"]


#: The reference root-logger format (config/logging_config.ini:20-21),
#: without the ini's stray literal quotes around the format string.
_LOG_FORMAT = ("%(asctime)s.%(msecs)03d [%(levelname)s] "
               "%(module)s.%(funcName)s:%(lineno)d "
               "(%(process)d:%(threadName)s) - %(message)s")

#: Marker attribute so repeated configure_logging calls (every job
#: module imports its entry point) never stack duplicate handlers.
_HANDLER_TAG = "_ab_metadata_pusher_spark_handler"


def configure_logging(ini_path: str | os.PathLike[str] | None = None,
                      *, level: int = logging.INFO) -> logging.Logger:
    """Job logging bootstrap — the reference's F7 surface.

    The reference loads ``config/logging_config.ini`` with
    ``logging.config.fileConfig`` at job import time
    (job/sample_mysql_aws_sqs_job.py:16-18): root logger at INFO with
    one stdout ``StreamHandler`` (config/logging_config.ini:1-21).

    * ``ini_path`` given (or ``$LOGGING_CONFIG_FILE`` set): defer to
      ``fileConfig`` exactly like the reference, but with
      ``disable_existing_loggers=False`` so Spark/py4j module loggers
      created before bootstrap keep working — the ini-default ``True``
      silently kills them.
    * no ini: programmatic equivalent of the reference's ini — root at
      ``level`` with a single stdout handler using the same format.
      Idempotent: re-running replaces this module's own handler instead
      of stacking duplicates (the reference re-runs fileConfig per job
      import, which resets handlers; this mirrors that contract without
      touching handlers owned by anyone else, e.g. pytest's).

    Returns the root logger, matching ``LOGGER = logging.getLogger()``
    at job/sample_mysql_aws_sqs_job.py:18.
    """
    root = logging.getLogger()
    ini = ini_path or os.environ.get("LOGGING_CONFIG_FILE") or None
    if ini:
        logging.config.fileConfig(os.fspath(ini),
                                  disable_existing_loggers=False)
        return root
    for h in list(root.handlers):
        if getattr(h, _HANDLER_TAG, False):
            root.removeHandler(h)
    handler = logging.StreamHandler(sys.stdout)
    handler.setLevel(level)
    handler.setFormatter(logging.Formatter(_LOG_FORMAT))
    setattr(handler, _HANDLER_TAG, True)
    root.addHandler(handler)
    root.setLevel(level)
    return root


def env(name: str, default: str = "") -> str:
    """Env var with default — the reference's config idiom
    (job/sample_mysql_aws_sqs_job.py:21-32)."""
    return os.environ.get(name, default)


class ScopedConfig:
    """A flat ``{"scope.sub.key": value}`` mapping with scope slicing.

    ``conf.scoped("publisher.sqs")`` returns a new ScopedConfig whose keys
    have the prefix stripped, mirroring ``Scoped.get_scoped_conf``.
    ``with_fallback`` merges defaults at lower priority, mirroring pyhocon's
    ``ConfigTree.with_fallback``.
    """

    def __init__(self, data: Mapping[str, Any] | None = None) -> None:
        self._data: dict[str, Any] = dict(data or {})

    def get(self, key: str, default: Any = None) -> Any:
        return self._data.get(key, default)

    def __getitem__(self, key: str) -> Any:
        return self._data[key]

    def __contains__(self, key: str) -> bool:
        return key in self._data

    def put(self, key: str, value: Any) -> "ScopedConfig":
        self._data[key] = value
        return self

    def scoped(self, scope: str) -> "ScopedConfig":
        prefix = scope.rstrip(".") + "."
        return ScopedConfig({
            k[len(prefix):]: v for k, v in self._data.items()
            if k.startswith(prefix)
        })

    def with_fallback(self, defaults: Mapping[str, Any] | "ScopedConfig") -> "ScopedConfig":
        base = defaults._data if isinstance(defaults, ScopedConfig) else defaults
        merged = dict(base)
        merged.update(self._data)
        return ScopedConfig(merged)

    def as_dict(self) -> dict[str, Any]:
        return dict(self._data)

    def __repr__(self) -> str:  # pragma: no cover
        return f"ScopedConfig({self._data!r})"
