"""Message-domain utilities.

The reference's asynchronous control plane (gr::Message property-map messages
between blocks and to the scheduler — SURVEY §1 'Message domain') maps to
plain host-side Python in this framework. These helpers mirror the reference's
message/test-fixture blocks:

- ``MessageDebug`` (message_debug.hpp): print/store endpoints.
- ``MessageStrobe`` (message_strobe.hpp) / ``ItemStrobe`` (item_strobe.hpp) /
  ``PacketStrobe`` (packet_strobe.hpp): periodic stimulus sources used by QA
  and apps (timed idle-packet injection).
"""

from __future__ import annotations

import threading
import time
from typing import Any, Callable

__all__ = ["MessageDebug", "MessageStrobe", "PacketStrobe"]


class MessageDebug:
    """Collect and/or print messages (property-map dicts)."""

    def __init__(self, do_print: bool = False):
        self._messages: list[dict] = []
        self._print = do_print
        self._lock = threading.Lock()

    def store(self, message: dict) -> None:
        with self._lock:
            self._messages.append(message)
        if self._print:
            print(f"[message] {message}")

    def messages(self) -> list[dict]:
        with self._lock:
            return list(self._messages)


class MessageStrobe:
    """Call ``callback(message)`` every ``interval`` seconds on a thread."""

    def __init__(
        self,
        callback: Callable[[dict], Any],
        message: dict,
        interval: float,
    ):
        self._callback = callback
        self._message = message
        self._interval = interval
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._run, daemon=True)

    def start(self):
        self._thread.start()
        return self

    def _run(self):
        while not self._stop.wait(self._interval):
            self._callback(dict(self._message))

    def stop(self):
        self._stop.set()
        if self._thread.is_alive():
            self._thread.join(timeout=2 * self._interval + 1)


class PacketStrobe:
    """Generate fixed-length zero packets at a fixed interval
    (packet_strobe.hpp). ``next_packet()`` blocks until the next is due."""

    def __init__(self, packet_length: int, interval: float):
        self.packet_length = packet_length
        self.interval = interval
        self._next_due = time.monotonic()

    def next_packet(self):
        import numpy as np

        now = time.monotonic()
        delay = self._next_due - now
        if delay > 0:
            time.sleep(delay)
        self._next_due = max(self._next_due + self.interval, time.monotonic())
        return np.zeros(self.packet_length, np.uint8)
