"""Wire-auth kernel: the mysql_native_password handshake scramble.

Parity with the reference's homegrown reader auth
(binlog/reader/MariadbPassword.java:7-33, test MariadbPasswordTest.java:14-25):

    scramble = sha1(password) XOR sha1(seed || sha1(sha1(password)))

This is CONTROL-PLANE code by design: the reference computes it once per
connection inside its blocking socket handshake (ReadableByteBuf auth
packet); in this engine the socket layer is replaced by the event-table
source (SURVEY §2.1 S2), so the kernel exists for semantic completeness of
the wire-reader surface — a deployment that pointed the streaming source at
a real replication endpoint would call it exactly once per reader, never
per row. Plain hashlib, no Spark types, deliberately.
"""

from __future__ import annotations

import hashlib


def native_password(password: str | None, seed: bytes | str) -> bytes:
    """20-byte auth response for the COM_BINLOG_DUMP handshake.

    Empty/None password returns b"" (zero-length auth payload), matching
    MariadbPassword.java:13-15.
    """
    if not password:
        return b""
    seed_b = seed.encode() if isinstance(seed, str) else bytes(seed)
    stage1 = hashlib.sha1(password.encode("utf-8")).digest()
    stage2 = hashlib.sha1(stage1).digest()
    digest = hashlib.sha1(seed_b + stage2).digest()
    return bytes(a ^ b for a, b in zip(stage1, digest))
