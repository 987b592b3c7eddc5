"""Snowflake ``__row_id`` generation (reference: api/data.go:123-129 +
pkg/util/util.go:9-29, bwmarrin/snowflake layout).

Layout (63 bits, sign bit clear): 41-bit millisecond timestamp since a
custom epoch | 10-bit node id | 12-bit per-millisecond sequence. Node id
derives from the hostname hash's last byte masked to 10 bits
(util/util.go:19-23) so concurrent API workers on different hosts don't
collide; same-host concurrency is serialized by the lock.
"""

from __future__ import annotations

import hashlib
import socket
import threading
import time

#: bwmarrin/snowflake default epoch (2010-11-04T01:42:54.657Z, Twitter's)
_EPOCH_MS = 1288834974657

_NODE_BITS = 10
_SEQ_BITS = 12
_SEQ_MASK = (1 << _SEQ_BITS) - 1


def _default_node_id() -> int:
    hostname = socket.gethostname()
    digest = hashlib.sha256(hostname.encode()).digest()
    return digest[-1] & 0x3FF


class SnowflakeGenerator:
    def __init__(self, node_id: int | None = None):
        self.node_id = (_default_node_id() if node_id is None else node_id) & 0x3FF
        self._lock = threading.Lock()
        self._last_ms = -1
        self._seq = 0

    def next_id(self) -> int:
        with self._lock:
            now = int(time.time() * 1000)
            if now == self._last_ms:
                self._seq = (self._seq + 1) & _SEQ_MASK
                if self._seq == 0:  # sequence exhausted: spin to next ms
                    while now <= self._last_ms:
                        now = int(time.time() * 1000)
            else:
                self._seq = 0
            self._last_ms = now
            return (
                ((now - _EPOCH_MS) << (_NODE_BITS + _SEQ_BITS))
                | (self.node_id << _SEQ_BITS)
                | self._seq
            )


_GLOBAL = SnowflakeGenerator()


def next_row_id() -> int:
    return _GLOBAL.next_id()
