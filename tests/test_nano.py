"""Spec-shaped NanoTDF (container="zip" nano analog) — layout conformance,
independent crypto recomputation, tamper detection, determinism, and the
Spark pipeline integration.

The expected layout is the public NanoTDF spec's (github.com/opentdf/spec,
nanotdf): L1L magic, resource-locator KAS, ECC/binding + symmetric-config
mode bytes, embedded plaintext policy with a GMAC binding, compressed P-256
ephemeral key, 3-byte payload length, 3-byte IV, AES-256-GCM body. The
reference emits this shape via the SDK (ConvertToNanoTDF.java:121; read at
ConvertFromNanoTDF.java:51).
"""

import hashlib
import json
import struct

import pytest
from cryptography.hazmat.primitives import hashes, serialization
from cryptography.hazmat.primitives.asymmetric import ec
from cryptography.hazmat.primitives.ciphers.aead import AESGCM
from cryptography.hazmat.primitives.kdf.hkdf import HKDF

from ztdf_spark import nano, ops, tdf
from ztdf_spark.settings import NANO_MIME, Settings

MASTER = b"test-master-secret-for-nanospec!"
KAS = ["https://kas1.example.com/kas"]
ATTRS = [
    "https://example.com/attr/class/value/secret",
    "https://example.com/attr/dept/value/eng",
]


def _enc(payload=b"hello nano spec", **kw):
    return nano.encrypt_nano_spec(
        payload,
        doc_id=kw.pop("doc_id", "doc-1"),
        lsn=kw.pop("lsn", 7),
        kas_urls=kw.pop("kas_urls", KAS),
        data_attributes=kw.pop("data_attributes", ATTRS),
        master_secret=MASTER,
        **kw,
    )


# ---------------------------------------------------------------------------
# Layout conformance — hand-rolled cursor, independent of parse_nano_spec
# ---------------------------------------------------------------------------


def test_spec_layout_field_by_field():
    blob = _enc()
    assert blob[:3] == b"L1L"  # magic+version
    off = 3
    proto, loc_len = blob[off], blob[off + 1]
    off += 2
    assert proto == 0x01  # https
    assert blob[off : off + loc_len] == b"kas1.example.com/kas"  # no scheme
    off += loc_len
    ecc_mode, sym_cfg = blob[off], blob[off + 1]
    off += 2
    assert ecc_mode == 0x00  # GMAC binding (bit7=0), secp256r1 (bits0-2)
    assert sym_cfg == 0x05  # no signature (bit7=0), AES-256-GCM-128
    assert blob[off] == 0x01  # embedded plaintext policy
    off += 1
    (plen,) = struct.unpack_from(">H", blob, off)
    off += 2
    policy = json.loads(blob[off : off + plen])
    assert policy["body"]["dataAttributes"] == ATTRS
    assert policy["body"]["dissem"] == []
    off += plen + 8  # skip GMAC binding (verified separately below)
    eph = blob[off : off + 33]
    assert eph[0] in (0x02, 0x03)  # compressed P-256 point
    # the point must be ON the curve — from_encoded_point validates
    ec.EllipticCurvePublicKey.from_encoded_point(ec.SECP256R1(), eph)
    off += 33
    body_len = int.from_bytes(blob[off : off + 3], "big")
    off += 3
    body = blob[off:]
    assert len(body) == body_len  # nothing trailing
    assert body_len == 3 + len(b"hello nano spec") + 16  # iv + ct + tag
    assert body[:3] != b"\x00\x00\x00"  # reserved for the policy binding


def test_independent_crypto_recomputation():
    """Open the envelope with raw cryptography primitives only — ECDH against
    the KAS key, the spec's HKDF salt, GMAC binding, GCM body — none of
    decrypt_nano_spec's code path."""
    payload = b"independently verified payload"
    blob = _enc(payload)
    f = nano.parse_nano_spec(blob)

    kas_priv = nano.kas_ec_private_key(MASTER, f["kas_url"])
    eph_pub = ec.EllipticCurvePublicKey.from_encoded_point(
        ec.SECP256R1(), f["ephemeral_point"]
    )
    shared = kas_priv.exchange(ec.ECDH(), eph_pub)
    key = HKDF(
        algorithm=hashes.SHA256(),
        length=32,
        salt=hashlib.sha256(b"L1L").digest(),
        info=b"",
    ).derive(shared)
    # policy binding: trailing 8 bytes of GMAC(policy, zero nonce)
    tag = AESGCM(key).encrypt(b"\x00" * 12, b"", f["policy_body"])
    assert tag[-8:] == f["binding"]
    # body: 9 zero bytes || 3-byte iv nonce
    out = AESGCM(key).decrypt(b"\x00" * 9 + f["iv"], f["ciphertext"], None)
    assert out == payload


def test_ecdh_symmetry_with_ephemeral_private():
    """The writer-side derivation agrees: eph_priv × kas_pub == kas_priv ×
    eph_pub (sanity that the envelope really is an ECDH construction)."""
    blob = _enc()
    f = nano.parse_nano_spec(blob)
    kas_priv = nano.kas_ec_private_key(MASTER, f["kas_url"])
    eph_pub = ec.EllipticCurvePublicKey.from_encoded_point(
        ec.SECP256R1(), f["ephemeral_point"]
    )
    assert kas_priv.public_key().public_bytes(
        serialization.Encoding.X962, serialization.PublicFormat.CompressedPoint
    ) != f["ephemeral_point"]  # distinct key pairs
    assert nano.decrypt_nano_spec(blob, master_secret=MASTER) == b"hello nano spec"
    assert kas_priv.exchange(ec.ECDH(), eph_pub)  # non-degenerate shared secret


# ---------------------------------------------------------------------------
# Round trips, determinism, sniffing
# ---------------------------------------------------------------------------


def test_roundtrip_and_policy_readback():
    blob = _enc(b"payload-bytes")
    assert nano.decrypt_nano_spec(blob, master_secret=MASTER) == b"payload-bytes"
    assert nano.nano_spec_policy_attributes(blob) == ATTRS
    # the tdf-level entry points sniff the container per record
    assert tdf.decrypt_nano(blob, master_secret=MASTER) == b"payload-bytes"
    assert tdf.nano_policy_attributes(blob) == ATTRS


def test_container_switch_parity_and_validation():
    via_tdf = tdf.encrypt_nano(
        b"x",
        doc_id="d",
        lsn=1,
        kas_urls=KAS,
        data_attributes=ATTRS,
        master_secret=MASTER,
        container="zip",
    )
    direct = _enc(b"x", doc_id="d", lsn=1)
    assert via_tdf == direct  # byte-identical delegation
    with pytest.raises(tdf.TdfError, match="container"):
        tdf.encrypt_nano(
            b"x", doc_id="d", lsn=1, kas_urls=KAS, data_attributes=ATTRS,
            master_secret=MASTER, container="tar",
        )


def test_deterministic_replay_and_per_record_variation():
    assert _enc() == _enc()  # replayed batch → byte-identical envelope
    other_doc = _enc(doc_id="doc-2")
    other_lsn = _enc(lsn=8)
    assert len({_enc(), other_doc, other_lsn}) == 3
    # distinct ctx → distinct IVs (no (key, nonce) reuse across records)
    ivs = {nano.parse_nano_spec(b)["iv"] for b in (_enc(), other_doc, other_lsn)}
    assert len(ivs) == 3


def test_http_and_schemeless_kas_locator():
    blob = _enc(kas_urls=["http://kas.example.com"])
    assert nano.parse_nano_spec(blob)["kas_url"] == "http://kas.example.com"
    assert nano.decrypt_nano_spec(blob, master_secret=MASTER) == b"hello nano spec"
    blob2 = _enc(kas_urls=["kas.example.com"])  # schemeless defaults to https
    assert nano.parse_nano_spec(blob2)["kas_url"] == "https://kas.example.com"
    assert nano.decrypt_nano_spec(blob2, master_secret=MASTER) == b"hello nano spec"


# ---------------------------------------------------------------------------
# Tamper + malformed input → per-record-shaped failures
# ---------------------------------------------------------------------------


def _flip(blob: bytes, idx: int) -> bytes:
    return blob[:idx] + bytes([blob[idx] ^ 0x01]) + blob[idx + 1 :]


def test_tamper_detection():
    blob = _enc()
    with pytest.raises(Exception):  # ciphertext bit flip → GCM failure
        nano.decrypt_nano_spec(_flip(blob, len(blob) - 1), master_secret=MASTER)
    # policy byte flip → binding mismatch (surfaces BEFORE payload decrypt)
    policy_off = blob.index(b'{"body"')
    with pytest.raises(tdf.TdfError, match="binding"):
        nano.decrypt_nano_spec(_flip(blob, policy_off + 12), master_secret=MASTER)
    # binding byte flip → same
    f = nano.parse_nano_spec(blob)
    binding_off = blob.index(f["binding"])
    with pytest.raises(tdf.TdfError, match="binding"):
        nano.decrypt_nano_spec(_flip(blob, binding_off), master_secret=MASTER)
    # wrong master (different emulated KAS key) → binding mismatch
    with pytest.raises(tdf.TdfError):
        nano.decrypt_nano_spec(blob, master_secret=b"other-master")


def test_malformed_envelopes_raise_format_error():
    blob = _enc()
    with pytest.raises(nano.NanoFormatError, match="magic"):
        nano.parse_nano_spec(b"NOPE" + blob[3:])
    with pytest.raises(nano.NanoFormatError):
        nano.parse_nano_spec(blob[: len(blob) // 2])  # truncated mid-header/body
    with pytest.raises(nano.NanoFormatError):
        nano.parse_nano_spec(blob[:10])
    # unsupported mode bytes rejected explicitly
    loc_len = blob[4]
    mode_off = 5 + loc_len
    bad_curve = blob[:mode_off] + b"\x02" + blob[mode_off + 1 :]
    with pytest.raises(nano.NanoFormatError, match="curve"):
        nano.parse_nano_spec(bad_curve)
    # flipping a GMAC envelope's mode byte to ECDSA shifts every later
    # offset (64-byte binding slice) → per-record failure, never silent
    flipped = blob[:mode_off] + b"\x80" + blob[mode_off + 1 :]
    with pytest.raises((nano.NanoFormatError, tdf.TdfError)):
        nano.decrypt_nano_spec(flipped, master_secret=MASTER)


def test_input_gates():
    with pytest.raises(tdf.TdfError, match="exceeds_size_limit"):
        _enc(b"\x00" * (16 * 1024 * 1024 + 3))
    with pytest.raises(tdf.TdfError, match="KAS"):
        _enc(kas_urls=[])
    with pytest.raises(tdf.TdfError, match="attribute"):
        _enc(data_attributes=[])


# ---------------------------------------------------------------------------
# ECDSA policy binding (spec ecc-mode bit 7)
# ---------------------------------------------------------------------------


def test_ecdsa_binding_roundtrip_and_mode_byte():
    blob = _enc(b"ecdsa payload", ecdsa_binding=True)
    loc_len = blob[4]
    assert blob[5 + loc_len] == 0x80  # bit7 set, curve secp256r1
    f = nano.parse_nano_spec(blob)
    assert f["ecdsa_binding"] is True and len(f["binding"]) == 64
    assert nano.decrypt_nano_spec(blob, master_secret=MASTER) == b"ecdsa payload"
    assert tdf.decrypt_nano(blob, master_secret=MASTER) == b"ecdsa payload"  # sniffed
    # RFC 6979 deterministic nonce → replay is byte-identical
    assert blob == _enc(b"ecdsa payload", ecdsa_binding=True)


def test_ecdsa_binding_header_only_verification():
    """The ECDSA binding verifies from header fields alone — no ECDH, no
    master secret — via raw cryptography primitives (independent path)."""
    blob = _enc(ecdsa_binding=True)
    f = nano.parse_nano_spec(blob)
    from cryptography.hazmat.primitives.asymmetric.utils import encode_dss_signature

    eph_pub = ec.EllipticCurvePublicKey.from_encoded_point(
        ec.SECP256R1(), f["ephemeral_point"]
    )
    der = encode_dss_signature(
        int.from_bytes(f["binding"][:32], "big"), int.from_bytes(f["binding"][32:], "big")
    )
    eph_pub.verify(der, f["policy_body"], ec.ECDSA(hashes.SHA256()))  # raises on mismatch


def test_ecdsa_binding_tamper_detection():
    blob = _enc(ecdsa_binding=True)
    policy_off = blob.index(b'{"body"')
    with pytest.raises(tdf.TdfError, match="binding"):
        nano.decrypt_nano_spec(_flip(blob, policy_off + 12), master_secret=MASTER)
    f = nano.parse_nano_spec(blob)
    binding_off = blob.index(f["binding"])
    with pytest.raises(tdf.TdfError, match="binding"):
        nano.decrypt_nano_spec(_flip(blob, binding_off + 5), master_secret=MASTER)


def test_ecdsa_binding_settings_gate():
    from ztdf_spark.settings import ConfigurationError

    with pytest.raises(ConfigurationError, match="nano_ecdsa_binding"):
        Settings(nano_ecdsa_binding=True)  # frame container has no binding
    s = Settings(container_format="zip", nano_ecdsa_binding=True)
    assert s.fingerprint() != Settings(container_format="zip").fingerprint()
    with pytest.raises(tdf.TdfError, match="spec container"):
        tdf.encrypt_nano(
            b"x", doc_id="d", lsn=1, kas_urls=KAS, data_attributes=ATTRS,
            master_secret=MASTER, container="frame", ecdsa_binding=True,
        )


def test_spark_ecdsa_binding_roundtrip(spark):
    s = Settings(container_format="zip", nano_ecdsa_binding=True)
    enc = ops.encrypt_batch(_mk_batch(spark, 8), s, fmt="nano")
    dec = ops.decrypt_batch(enc, s, fmt="nano")
    rows = dec.select("route", "ciphertext", "tokens", "tokens_out").collect()
    assert len(rows) == 8
    for r in rows:
        assert r.route == "success" and r.tokens_out == r.tokens
        blob = bytes(r.ciphertext)
        assert blob[5 + blob[4]] == 0x80  # ECDSA mode on the wire


# ---------------------------------------------------------------------------
# Spark integration: nano encrypt UDF in spec mode, mixed-container decrypt
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def zip_settings():
    return Settings(container_format="zip")


def _mk_batch(spark, n=20):
    rows = [
        (f"doc-{i:04d}", i + 1, "I", list(range(i, i + 5)), None,
         "https://example.com/attr/class/value/secret", None)
        for i in range(n)
    ]
    return spark.createDataFrame(
        rows, "doc_id string, lsn long, op string, tokens array<int>, kas_url string, "
        "tdf_attribute string, assertions string",
    )


def test_spark_encrypt_nano_spec_roundtrip(spark, zip_settings):
    enc = ops.encrypt_batch(_mk_batch(spark), zip_settings, fmt="nano")
    dec = ops.decrypt_batch(enc, zip_settings, fmt="nano")
    rows = dec.select("doc_id", "route", "mime_type", "ciphertext", "tokens", "tokens_out").collect()
    assert len(rows) == 20
    for r in rows:
        assert r.route == "success"
        assert r.mime_type == NANO_MIME
        assert bytes(r.ciphertext[:3]) == b"L1L"  # spec magic on the wire
        assert r.tokens_out == r.tokens


def test_spark_mixed_nano_container_decrypt(spark, settings, zip_settings):
    """Frame- and spec-container nano envelopes in one table decrypt in one
    pass — the reader sniffs per record (same migration path as ZTDF)."""
    frame = ops.encrypt_batch(_mk_batch(spark, 10), settings, fmt="nano")
    spec = ops.encrypt_batch(_mk_batch(spark, 10), zip_settings, fmt="nano")
    mixed = frame.unionByName(spec)
    dec = ops.decrypt_batch(mixed, settings, fmt="nano")
    rows = dec.select("tokens", "tokens_out", "decrypt_error").collect()
    assert len(rows) == 20
    assert all(r.decrypt_error is None and r.tokens_out == r.tokens for r in rows)
