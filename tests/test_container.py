"""Spec-shaped ZIP container (container="zip") — layout conformance,
round trips, independent integrity recomputation, tamper detection, and
the Spark pipeline integration.

The expected byte/field layout is the public OpenTDF spec's
(github.com/opentdf/spec): a ZIP of ``0.payload`` + ``0.manifest.json``,
split-type encryptionInformation, GMAC segment hashes, HS256 root
signature, HS256 policy binding over the Base64 policy. The reference emits
this shape via the SDK (ConvertToZTDF.java:218, mime at :228).
"""

import base64
import hashlib
import hmac
import io
import json
import zipfile

import pytest

from ztdf_spark import container as zc
from ztdf_spark import ops, tdf
from ztdf_spark.settings import Settings

MASTER = b"test-master-secret-for-container"
KAS = ["https://kas1.example.com", "https://kas2.example.com"]
ATTRS = ["https://example.com/attr/class/value/secret"]


def _enc(payload=b"hello container", container="zip", **kw):
    return tdf.encrypt_ztdf(
        payload,
        doc_id=kw.pop("doc_id", "doc-1"),
        lsn=kw.pop("lsn", 7),
        kas_urls=kw.pop("kas_urls", KAS),
        data_attributes=kw.pop("data_attributes", ATTRS),
        master_secret=MASTER,
        container=container,
        **kw,
    )


# ---------------------------------------------------------------------------
# ZIP writer/reader vs stdlib zipfile (cross-validation both directions)
# ---------------------------------------------------------------------------


def test_zip_pack_is_readable_by_stdlib_zipfile():
    blob = zc.zip_pack([("0.payload", b"\x00\x01" * 100), ("0.manifest.json", b'{"a":1}')])
    with zipfile.ZipFile(io.BytesIO(blob)) as z:
        assert z.namelist() == ["0.payload", "0.manifest.json"]
        assert z.read("0.payload") == b"\x00\x01" * 100
        assert z.read("0.manifest.json") == b'{"a":1}'
        assert z.testzip() is None  # CRCs all good


def test_zip_reader_reads_stdlib_zipfile_output():
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_STORED) as z:
        z.writestr("0.payload", b"payload-bytes")
        z.writestr("0.manifest.json", b"{}")
    entries = zc.zip_entries(buf.getvalue())
    assert entries["0.payload"] == b"payload-bytes"
    assert entries["0.manifest.json"] == b"{}"


def test_zip_reader_rejects_compressed_and_corrupt():
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("0.payload", b"A" * 1000)
    with pytest.raises(zc.ZipFormatError, match="method"):
        zc.zip_entries(buf.getvalue())
    blob = bytearray(zc.zip_pack([("e", b"data-here")]))
    blob[30 + 1] ^= 0xFF  # flip a data byte behind the local header
    with pytest.raises(zc.ZipFormatError, match="CRC"):
        zc.zip_entries(bytes(blob))
    with pytest.raises(zc.ZipFormatError, match="central-directory"):
        zc.zip_entries(b"PK\x03\x04 not really a zip")


# ---------------------------------------------------------------------------
# Spec shape + independent integrity recomputation
# ---------------------------------------------------------------------------


def test_manifest_spec_shape():
    blob = _enc()
    with zipfile.ZipFile(io.BytesIO(blob)) as z:  # read with stdlib, not our code
        manifest = json.loads(z.read("0.manifest.json"))
        payload = z.read("0.payload")
    assert manifest["schemaVersion"] == tdf.TDF_SPEC_VERSION
    assert manifest["payload"] == {
        "type": "reference",
        "url": "0.payload",
        "protocol": "zip",
        "mimeType": "application/octet-stream",
        "isEncrypted": True,
    }
    enc = manifest["encryptionInformation"]
    assert enc["type"] == "split"
    assert enc["method"] == {"algorithm": "AES-256-GCM", "isStreamable": True, "iv": ""}
    assert len(enc["keyAccess"]) == len(KAS)
    for ka, url in zip(enc["keyAccess"], KAS):
        assert ka["type"] == "wrapped"
        assert ka["protocol"] == "kas"
        assert ka["url"] == url
        assert ka["policyBinding"]["alg"] == "HS256"
    policy = json.loads(base64.b64decode(enc["policy"]))
    assert policy["body"]["dataAttributes"] == ATTRS
    integ = enc["integrityInformation"]
    assert integ["segmentHashAlg"] == "GMAC"
    assert integ["rootSignature"]["alg"] == "HS256"
    sizes = [s["encryptedSegmentSize"] for s in integ["segments"]]
    assert sum(sizes) == len(payload)
    for s in integ["segments"]:
        assert s["encryptedSegmentSize"] == s["segmentSize"] + 28  # iv(12)+tag(16)


def test_integrity_recomputed_independently():
    """Recompute policy binding, segment GMACs, and root signature with raw
    hmac/hashlib here — NOT tdf.py helpers — so a mirrored sign/verify bug
    pair in the engine cannot self-certify."""
    payload = bytes(range(256)) * 13
    blob = _enc(payload)
    with zipfile.ZipFile(io.BytesIO(blob)) as z:
        manifest = json.loads(z.read("0.manifest.json"))
        enc_payload = z.read("0.payload")
    enc = manifest["encryptionInformation"]
    # recover the DEK the only way a KAS could: unwrap via the emulated KEK
    policy_bytes = base64.b64decode(enc["policy"])
    from cryptography.hazmat.primitives.ciphers.aead import AESGCM

    wk = base64.b64decode(enc["keyAccess"][0]["wrappedKey"])
    kek = tdf.kek_for_kas(MASTER, KAS[0])
    dek = AESGCM(kek).decrypt(wk[:12], wk[12:], policy_bytes)
    # policy binding: Base64(hex(HMAC-SHA256(b64policy, DEK)))
    expect = base64.b64encode(
        hmac.new(dek, enc["policy"].encode(), hashlib.sha256).hexdigest().encode()
    ).decode()
    assert enc["keyAccess"][0]["policyBinding"]["hash"] == expect
    # segment GMAC = GCM tag = last 16 bytes of each encrypted segment
    off, tags = 0, b""
    for seg in enc["integrityInformation"]["segments"]:
        chunk = enc_payload[off : off + seg["encryptedSegmentSize"]]
        off += seg["encryptedSegmentSize"]
        assert base64.b64decode(seg["hash"]) == chunk[-16:]
        tags += chunk[-16:]
    assert off == len(enc_payload)
    # root signature: HMAC-SHA256 over concatenated segment hashes, DEK key
    root = hmac.new(dek, tags, hashlib.sha256).digest()
    assert base64.b64decode(enc["integrityInformation"]["rootSignature"]["sig"]) == root


def test_multi_segment_payload(monkeypatch):
    monkeypatch.setattr(tdf, "SEGMENT_SIZE_DEFAULT", 64)
    # encrypt_ztdf reads the constant via _encrypt_segments default; patch there
    orig = tdf._encrypt_segments

    def seg64(dek, payload, ctx, seg_size=64):
        return orig(dek, payload, ctx, seg_size)

    monkeypatch.setattr(tdf, "_encrypt_segments", seg64)
    payload = b"0123456789abcdef" * 40  # 640 bytes → 10 segments
    blob = _enc(payload)
    manifest = tdf.read_manifest(blob)
    segs = manifest["encryptionInformation"]["integrityInformation"]["segments"]
    assert len(segs) == 10
    assert all(s["segmentSize"] == 64 for s in segs)
    assert tdf.decrypt_ztdf(blob, master_secret=MASTER) == payload


# ---------------------------------------------------------------------------
# Round trips, determinism, encryptor parity, tamper
# ---------------------------------------------------------------------------


def test_zip_roundtrip_and_sniffing():
    payload = b"round trip me"
    zblob = _enc(payload)
    fblob = _enc(payload, container="frame")
    assert zblob[:4] == b"PK\x03\x04" and fblob[:5] == b"ZTDF1"
    # decrypt auto-sniffs both containers
    assert tdf.decrypt_ztdf(zblob, master_secret=MASTER) == payload
    assert tdf.decrypt_ztdf(fblob, master_secret=MASTER) == payload
    assert tdf.read_manifest(zblob)["encryptionInformation"]["type"] == "split"


def test_zip_deterministic_and_encryptor_parity():
    a, b = _enc(b"same payload"), _enc(b"same payload")
    assert a == b  # byte-identical replay (idempotent MERGE stability)
    enc = tdf.ZtdfEncryptor(MASTER, container="zip")
    c = enc.encrypt(b"same payload", doc_id="doc-1", lsn=7, kas_urls=KAS, data_attributes=ATTRS)
    assert c == a  # hot-path class pinned byte-identical to the function
    # and caching holds across calls
    assert enc.encrypt(b"same payload", doc_id="doc-1", lsn=7, kas_urls=KAS, data_attributes=ATTRS) == a


def test_zip_assertions_signed_and_verified():
    from cryptography.hazmat.primitives import serialization
    from cryptography.hazmat.primitives.asymmetric import rsa

    key = rsa.generate_private_key(public_exponent=65537, key_size=2048)
    RSA_KEY = key.private_bytes(
        serialization.Encoding.PEM,
        serialization.PrivateFormat.PKCS8,
        serialization.NoEncryption(),
    )

    asst = tdf.parse_assertion(
        {
            "id": "a1",
            "type": "handling",
            "scope": "tdo",
            "appliesToState": "encrypted",
            "statement": {"value": "x", "format": "json"},
        }
    )
    blob = _enc(b"p", assertions=[asst], signing_key_pem=RSA_KEY)
    manifest = tdf.read_manifest(blob)
    assert manifest["assertions"][0]["binding"]["method"] == "jws"
    out = tdf.decrypt_ztdf(
        blob, master_secret=MASTER, verify_assertions=True, verification_key_pem=RSA_KEY
    )
    assert out == b"p"
    # tamper with the assertion statement → per-record failure
    m2 = manifest.copy()
    m2["assertions"] = [dict(manifest["assertions"][0])]
    m2["assertions"][0]["statement"] = {"value": "TAMPERED", "format": "json"}
    entries = zc.zip_entries(blob)
    forged = zc.zip_pack(
        [
            ("0.payload", entries["0.payload"]),
            ("0.manifest.json", json.dumps(m2, separators=(",", ":")).encode()),
        ]
    )
    with pytest.raises(tdf.TdfError, match="assertion"):
        tdf.decrypt_ztdf(forged, master_secret=MASTER, verify_assertions=True, verification_key_pem=RSA_KEY)


def test_zip_tamper_detection():
    blob = _enc(b"tamper target payload")
    entries = zc.zip_entries(blob)
    # flip one payload byte, CRC fixed up by repacking → caught by GMAC
    bad_payload = bytearray(entries["0.payload"])
    bad_payload[13] ^= 0x01
    forged = zc.zip_pack(
        [("0.payload", bytes(bad_payload)), ("0.manifest.json", entries["0.manifest.json"])]
    )
    with pytest.raises(tdf.TdfError, match="GMAC|decrypt"):
        tdf.decrypt_ztdf(forged, master_secret=MASTER)
    # swap the policy for a different-attribute one → binding/unwrap failure
    manifest = json.loads(entries["0.manifest.json"])
    other_policy = {"body": {"dataAttributes": ["https://example.com/attr/c/value/other"]}, "uuid": "00"}
    manifest["encryptionInformation"]["policy"] = base64.b64encode(
        json.dumps(other_policy, sort_keys=True, separators=(",", ":")).encode()
    ).decode()
    forged2 = zc.zip_pack(
        [
            ("0.payload", entries["0.payload"]),
            ("0.manifest.json", json.dumps(manifest, separators=(",", ":")).encode()),
        ]
    )
    with pytest.raises(tdf.TdfError):
        tdf.decrypt_ztdf(forged2, master_secret=MASTER)


def test_zip_rewrap_payload_untouched():
    blob = _enc(b"rotate my keys")
    new_kas = ["https://kas3.example.com"]
    rot = tdf.rewrap_ztdf(blob, master_secret=MASTER, kas_urls=new_kas)
    assert zc.zip_entries(rot)["0.payload"] == zc.zip_entries(blob)["0.payload"]
    m = tdf.read_manifest(rot)
    kas = m["encryptionInformation"]["keyAccess"]
    assert [ka["url"] for ka in kas] == new_kas
    assert kas[0]["policyBinding"]["alg"] == "HS256"
    assert tdf.decrypt_ztdf(rot, master_secret=MASTER) == b"rotate my keys"
    # idempotent
    assert tdf.rewrap_ztdf(rot, master_secret=MASTER, kas_urls=new_kas) == rot


# ---------------------------------------------------------------------------
# Spark integration: the encrypt UDF in zip mode, mixed-container decrypt
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


def test_spark_encrypt_zip_roundtrip(spark, zip_settings):
    enc = ops.encrypt_batch(_mk_batch(spark), zip_settings, fmt="ztdf")
    dec = ops.decrypt_batch(enc, zip_settings, fmt="ztdf")
    rows = dec.select("doc_id", "route", "mime_type", "ciphertext", "tokens", "tokens_out").collect()
    assert len(rows) == 20
    for r in rows:
        assert r.route == "success"
        assert r.mime_type == "application/ztdf+zip"  # and now it IS a zip
        assert bytes(r.ciphertext[:4]) == b"PK\x03\x04"
        assert r.tokens_out == r.tokens


def test_spark_mixed_container_decrypt(spark, settings, zip_settings):
    """A table holding both frame- and zip-container envelopes decrypts in
    one pass — the reader sniffs per record (migration-friendly)."""
    frame = ops.encrypt_batch(_mk_batch(spark, 10), settings, fmt="ztdf")
    zipped = ops.encrypt_batch(_mk_batch(spark, 10), zip_settings, fmt="ztdf")
    mixed = frame.unionByName(zipped)
    dec = ops.decrypt_batch(mixed, settings, fmt="ztdf")
    rows = dec.select("tokens", "tokens_out", "decrypt_error").collect()
    assert len(rows) == 20
    assert all(r.decrypt_error is None and r.tokens_out == r.tokens for r in rows)


def test_settings_validation():
    with pytest.raises(Exception, match="container_format"):
        Settings(container_format="tar")
    assert Settings(container_format="zip").fingerprint() != Settings().fingerprint()
