"""Anomaly hooks — the reference's notification "UDFs"
(loudml/api.py:51-169): callbacks fired when an anomaly episode opens
or closes, e.g. to write an annotation (loudml/annotations.py:15-69).

Batch integration: after a detection pass, :func:`fire_hooks` walks
the episode frame (small — one row per episode) on the driver and
invokes each hook.  Streaming: call it inside ``foreachBatch``.
Hook exceptions are swallowed-and-logged exactly like the reference
(donut.py:1540-1546) so a bad hook cannot kill the job.
"""

from __future__ import annotations

import logging
from typing import Sequence

from pyspark.sql import DataFrame

log = logging.getLogger(__name__)


class Hook:
    """Subclass and override; config dict mirrors the reference's
    per-hook config blob."""

    hook_type = "hook"

    def __init__(self, name: str, config: dict | None = None):
        self.name = name
        self.config = config or {}

    @classmethod
    def validate(cls, config):
        """Reject a bad config at registration time (the reference
        validates through each hook's voluptuous schema,
        server.py:963-974).  Base rule: config must be a mapping."""
        if config is not None and not isinstance(config, dict):
            raise ValueError("hook config must be an object")

    def describe(self) -> dict:
        return {"name": self.name, "type": self.hook_type,
                "config": self.config}

    def on_anomaly_start(self, model: str, start_ts: float, score: float,
                         **kw):
        pass

    def on_anomaly_end(self, model: str, end_ts: float, score: float, **kw):
        pass


class LoggingHook(Hook):
    """Built-in notification hook: logs episode open/close.  The
    reference ships hook implementations as plugins resolved through
    the ``loudml.hooks`` entry point (server.py:969); this is the
    in-tree equivalent registered under type ``logging``, and
    :func:`register_hook_type` is the extension point."""

    hook_type = "logging"

    def on_anomaly_start(self, model, start_ts, score, **kw):
        log.warning("[%s] anomaly START ts=%s score=%.1f",
                    model, start_ts, score)

    def on_anomaly_end(self, model, end_ts, score, **kw):
        log.warning("[%s] anomaly END ts=%s score=%.1f",
                    model, end_ts, score)


class AnnotationHook(Hook):
    """Writes every finished episode into an AnnotationStore — the
    round-trip that lets the next training run mask known anomalies."""

    def __init__(self, name: str, store, model: str = ""):
        super().__init__(name)
        self.store = store
        self.model = model

    hook_type = "annotation"

    def on_anomaly_end(self, model, end_ts, score, start_ts=None, **kw):
        self.store.insert(
            start_ts if start_ts is not None else end_ts, end_ts,
            text=f"anomaly score={score:.1f}", model=model or self.model,
        )


# -- hook-type registry (≙ the reference's `loudml.hooks` entry-point
#    lookup, server.py:969 `loudml.load_entry_point`) -------------------
HOOK_TYPES: dict[str, type] = {"logging": LoggingHook}


def register_hook_type(name: str, cls: type) -> None:
    HOOK_TYPES[name] = cls


def load_hook_type(name: str):
    """None for an unknown type — the caller maps that to HTTP 404
    exactly like the reference (server.py:970-971)."""
    return HOOK_TYPES.get(name)


def fire_hooks(
    episodes: DataFrame,
    hooks: Sequence[Hook],
    *,
    model: str = "",
    series_end_ts: float | None = None,
) -> int:
    """Invoke hooks for each episode row (start always fires; end
    fires unless the episode is still open at the series end).
    Returns the number of episodes processed."""
    rows = episodes.collect()
    for r in rows:
        for hook in hooks:
            try:
                hook.on_anomaly_start(
                    model, r["start_ts"], r["max_score"]
                )
            except Exception:
                log.exception("hook %s on_anomaly_start failed", hook.name)
        still_open = (
            series_end_ts is not None and r["end_ts"] >= series_end_ts
        )
        if not still_open:
            for hook in hooks:
                try:
                    hook.on_anomaly_end(
                        model, r["end_ts"], r["max_score"],
                        start_ts=r["start_ts"],
                    )
                except Exception:
                    log.exception("hook %s on_anomaly_end failed", hook.name)
    return len(rows)
