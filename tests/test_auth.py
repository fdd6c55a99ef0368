"""mysql_native_password scramble (sources/auth.py) — the reference's
MariadbPasswordTest.java:14-25 scenario plus the algebraic invariants of
MariadbPassword.java:17-29. No Spark session needed (control-plane code)."""

import hashlib

from mariadb_cdc_spark.sources.auth import native_password


def test_reference_vector_shape():
    # the reference test's exact inputs (MariadbPasswordTest.java:16):
    # password "1", seed "-?76GE`70)|X$Ft8Y5?{"
    out = native_password("1", "-?76GE`70)|X$Ft8Y5?{")
    assert len(out) == 20
    # independently recomputed: sha1(pw) ^ sha1(seed || sha1(sha1(pw)))
    s1 = hashlib.sha1(b"1").digest()
    s2 = hashlib.sha1(s1).digest()
    dg = hashlib.sha1(b"-?76GE`70)|X$Ft8Y5?{" + s2).digest()
    assert out == bytes(a ^ b for a, b in zip(s1, dg))


def test_empty_password_empty_payload():
    # MariadbPassword.java:13-15
    assert native_password("", b"seed") == b""
    assert native_password(None, b"seed") == b""


def test_xor_roundtrip_recovers_stage1():
    # server-side check: result ^ sha1(seed||stage2) == stage1
    pw, seed = "s3cret", b"\x01\x02" * 10
    out = native_password(pw, seed)
    s1 = hashlib.sha1(pw.encode()).digest()
    dg = hashlib.sha1(seed + hashlib.sha1(s1).digest()).digest()
    assert bytes(a ^ b for a, b in zip(out, dg)) == s1


def test_seed_accepts_str_and_bytes():
    assert native_password("pw", "abc") == native_password("pw", b"abc")
