"""Structured events: typed event records → JSON lines + console.

Reference pattern: protobuf-typed log events emitted through a fire_event bus
with JSON or text formatting (core/dbt/events/core_types_pb2.py,
core/dbt/events/types.py). Spark-first simplification (SURVEY §2B row
"Structured events"): plain dataclasses serialized to JSON lines at
``target/logs/dbt.log.jsonl`` plus an optional console callback — the schema
(event name, ts, invocation_id, node info, data payload) matches what
downstream log consumers key on.
"""

from __future__ import annotations

import json
import os
import threading
import uuid
from dataclasses import dataclass, field
from datetime import datetime, timezone
from typing import Any, Callable, Optional


@dataclass
class Event:
    name: str  # e.g. NodeStart, NodeFinished, MainReportVersion
    data: dict[str, Any] = field(default_factory=dict)
    level: str = "info"
    ts: str = ""
    invocation_id: str = ""

    def to_dict(self) -> dict[str, Any]:
        return {
            "info": {
                "name": self.name,
                "level": self.level,
                "ts": self.ts,
                "invocation_id": self.invocation_id,
            },
            "data": self.data,
        }


class EventBus:
    """fire_event analog: thread-safe append to a JSONL file + callbacks."""

    def __init__(self, log_path: Optional[str] = None) -> None:
        self.log_path = log_path
        self.invocation_id = str(uuid.uuid4())
        self.callbacks: list[Callable[[Event], None]] = []
        self._lock = threading.Lock()
        if log_path:
            os.makedirs(os.path.dirname(log_path), exist_ok=True)

    def fire(self, name: str, level: str = "info", **data: Any) -> Event:
        ev = Event(
            name=name,
            data=data,
            level=level,
            ts=datetime.now(timezone.utc).isoformat(),
            invocation_id=self.invocation_id,
        )
        line = json.dumps(ev.to_dict(), default=str)
        with self._lock:
            if self.log_path:
                with open(self.log_path, "a") as f:
                    f.write(line + "\n")
            for cb in self.callbacks:
                cb(ev)
        return ev
