"""Checkpoint (offset) management — parity with the reference's
``Sequence`` / ``SequenceSaver`` (sequence.go:12-24).

Semantics preserved:
- ``(streamName, shardId) → sequenceNumber`` mapping (sequence.go:20-24).
- ``Init``: load saved sequence on shard start (sequence.go:26-36, A8).
- ``Store``: persist the last sequence of a batch, post-handler
  (kinesis.go:198-202, A6) with bounded retry (sequence.go:55-72, A7).
- ``Stop``: delete the checkpoint when a shard closes (sequence.go:51-53,
  A9).
- ``InitQuery``: TRIM_HORIZON unless a checkpoint exists, then
  AFTER_SEQUENCE_NUMBER (sequence.go:74-89, A2).

Reference bugs deliberately NOT replicated (SURVEY.md §7):
- sequence.go:62-71 swallows checkpoint-write failure after retries (the
  shadowed ``err``); here ``store`` RAISES after exhausting retries.
- sequence.go:52 panics on ``Stop`` with no saver; here it is a no-op.
"""

from __future__ import annotations

import json
import os
import tempfile
import threading
from typing import Protocol

DEFAULT_RETRIES = 3  # sequence.go:98

TRIM_HORIZON = "TRIM_HORIZON"
AFTER_SEQUENCE_NUMBER = "AFTER_SEQUENCE_NUMBER"


class SequenceSaver(Protocol):
    """User-pluggable offset store (sequence.go:20-24)."""

    def get(self, stream: str, shard: str) -> str | None: ...

    def set(self, stream: str, shard: str, sequence: str) -> None: ...

    def delete(self, stream: str, shard: str) -> None: ...


class InMemorySaver:
    """Process-local saver (test / single-driver use)."""

    def __init__(self) -> None:
        self._data: dict[tuple[str, str], str] = {}
        self._lock = threading.Lock()

    def get(self, stream: str, shard: str) -> str | None:
        with self._lock:
            return self._data.get((stream, shard))

    def set(self, stream: str, shard: str, sequence: str) -> None:
        with self._lock:
            self._data[(stream, shard)] = sequence

    def delete(self, stream: str, shard: str) -> None:
        with self._lock:
            self._data.pop((stream, shard), None)


class FlakySaver(InMemorySaver):
    """Test double: fails ``set`` the first ``fail_n`` times — exercises the
    retry path (A7) without the reference's swallowed-error bug."""

    def __init__(self, fail_n: int = 0) -> None:
        super().__init__()
        self.fail_n = fail_n
        self.attempts = 0

    def set(self, stream: str, shard: str, sequence: str) -> None:
        self.attempts += 1
        if self.attempts <= self.fail_n:
            raise OSError(f"simulated saver failure #{self.attempts}")
        super().set(stream, shard, sequence)


class JsonFileSaver:
    """Durable saver: one JSON file, atomic replace per write. On a real
    cluster this would be a DynamoDB/JDBC table; the interface is the
    contract, the file is the sandbox implementation."""

    def __init__(self, path: str) -> None:
        self.path = path
        self._lock = threading.Lock()

    def _load(self) -> dict[str, str]:
        if not os.path.exists(self.path):
            return {}
        with open(self.path) as f:
            return json.load(f)

    def _dump(self, data: dict[str, str]) -> None:
        d = os.path.dirname(self.path) or "."
        fd, tmp = tempfile.mkstemp(dir=d)
        try:
            with os.fdopen(fd, "w") as f:
                json.dump(data, f)
            os.replace(tmp, self.path)
        except BaseException:
            if os.path.exists(tmp):
                os.unlink(tmp)
            raise

    @staticmethod
    def _key(stream: str, shard: str) -> str:
        return f"{stream}\x00{shard}"

    def get(self, stream: str, shard: str) -> str | None:
        with self._lock:
            return self._load().get(self._key(stream, shard))

    def set(self, stream: str, shard: str, sequence: str) -> None:
        with self._lock:
            data = self._load()
            data[self._key(stream, shard)] = sequence
            self._dump(data)

    def delete(self, stream: str, shard: str) -> None:
        with self._lock:
            data = self._load()
            data.pop(self._key(stream, shard), None)
            self._dump(data)


class Sequence:
    """Per-shard cursor state (sequence.go:12-18). Accepts an injectable
    2-method logger like the reference (sequence.go:91-93, A19)."""

    def __init__(
        self,
        stream: str,
        shard: str,
        saver: SequenceSaver | None = None,
        retries: int = DEFAULT_RETRIES,
        logger=None,
    ) -> None:
        self.stream = stream
        self.shard = shard
        self.saver = saver
        self.retries = retries
        self.logger = logger
        self.sequence: str | None = None

    def init(self) -> "Sequence":
        """Load any saved checkpoint (sequence.go:26-36, A8)."""
        if self.saver is not None:
            self.sequence = self.saver.get(self.stream, self.shard)
        return self

    def init_query(self, default_type: str = TRIM_HORIZON) -> dict[str, str]:
        """Starting-position decision (sequence.go:74-89, A2): resume after
        the checkpoint iff one exists, else the caller's default."""
        if self.sequence:
            return {
                "iterator_type": AFTER_SEQUENCE_NUMBER,
                "starting_sequence_number": self.sequence,
            }
        return {"iterator_type": default_type}

    def store(self, sequence: str) -> None:
        """Persist a batch's last sequence with retry (kinesis.go:198-202 +
        sequence.go:55-72, A6/A7). Unlike the reference, exhausting retries
        RAISES — a lost checkpoint must be loud, not silent."""
        self.sequence = sequence
        if self.saver is None:
            return
        last_err: Exception | None = None
        for attempt in range(max(self.retries, 1)):
            try:
                self.saver.set(self.stream, self.shard, sequence)
                return
            except Exception as e:  # noqa: BLE001 — saver is user code
                last_err = e
                if self.logger is not None:
                    self.logger.error(
                        "checkpoint write attempt %d failed for %s/%s: %s",
                        attempt + 1,
                        self.stream,
                        self.shard,
                        e,
                    )
        raise RuntimeError(
            f"checkpoint write failed after {self.retries} retries "
            f"for {self.stream}/{self.shard}"
        ) from last_err

    def stop(self) -> None:
        """Shard closed (reshard): delete its checkpoint (kinesis.go:204-210
        → sequence.go:51-53, A9). No-op without a saver (the reference
        panics here; we don't)."""
        if self.saver is not None:
            self.saver.delete(self.stream, self.shard)
