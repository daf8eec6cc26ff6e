"""Time-ordered unique id generation for POST auto-ids.

The reference uses hyperbus IdGenerator (PrimaryWorker.scala:78) to
produce sortable unique ids so POSTed items are naturally ordered by
insertion (README «Идентификатор элемента»). This is a ULID-style
generator: 48-bit millisecond timestamp + 80 random bits, lowercase
base32hex (0-9a-v — NOT Crockford: sortability needs the alphabet in
ASCII order, Crockford's i/l/o/u exclusions break that), monotonic
within a process.
"""

from __future__ import annotations

import os
import threading
import time

_ALPHABET = "0123456789abcdefghijklmnopqrstuv"
_lock = threading.Lock()
_last: list = [0, 0]  # [last_ms, last_rand]


def _b32(value: int, length: int) -> str:
    out = []
    for _ in range(length):
        out.append(_ALPHABET[value & 31])
        value >>= 5
    return "".join(reversed(out))


def create_id() -> str:
    """26-char sortable id; strictly increasing within this process."""
    with _lock:
        ms = int(time.time() * 1000)
        rnd = int.from_bytes(os.urandom(10), "big")
        if ms < _last[0] or (ms == _last[0] and rnd <= _last[1]):
            ms = _last[0]
            rnd = _last[1] + 1
            if rnd >= 1 << 80:  # carry instead of wrapping below the predecessor
                ms += 1
                rnd = 0
        _last[0], _last[1] = ms, rnd
        return _b32(ms, 10) + _b32(rnd, 16)
