"""Crypto-core unit tests, mirroring the reference's processor-level
assertions (SURVEY.md §5) at the pure-Python layer."""

import base64
import json

import pytest

from ztdf_spark import tdf
from ztdf_spark.settings import NANO_MAX_SIZE, Settings, ConfigurationError

MASTER = b"unit-test-master-secret"


def _enc(tokens, doc_id="doc-1", lsn=7, kas=("https://kas1",), attrs=("https://a/attr/x/value/y",), **kw):
    return tdf.encrypt_ztdf(
        tdf.serialize_tokens(tokens),
        doc_id=doc_id,
        lsn=lsn,
        kas_urls=kas,
        data_attributes=attrs,
        master_secret=MASTER,
        **kw,
    )


def test_token_serialization_roundtrip():
    toks = [0, 1, 50256, 2**31 - 1, -1]
    assert tdf.deserialize_tokens(tdf.serialize_tokens(toks)) == toks


def test_ztdf_roundtrip_token_equality():
    # the per-row invariant: decrypt-then-compare (ConvertFromZTDFTest.java:126-129)
    toks = list(range(100))
    blob = _enc(toks)
    out = tdf.decrypt_ztdf(blob, master_secret=MASTER)
    assert tdf.deserialize_tokens(out) == toks


def test_ztdf_deterministic_ciphertext():
    # same (doc_id, lsn) → byte-identical envelope (idempotent MERGE stability)
    assert _enc([1, 2, 3]) == _enc([1, 2, 3])
    assert _enc([1, 2, 3], lsn=8) != _enc([1, 2, 3], lsn=7)


def test_manifest_policy_has_all_attributes():
    # two attrs → policy has exactly 2 FQNs (ConvertToZTDFTest.java:173-179)
    attrs = ("https://a/attr/x/value/1", "https://a/attr/x/value/2")
    m = tdf.read_manifest(_enc([1], attrs=attrs))
    policy = json.loads(base64.b64decode(m["encryptionInformation"]["policy"]))
    assert policy["body"]["dataAttributes"] == list(attrs)


def test_multi_kas_key_access_objects():
    # one key-access object per KAS URL (AbstractToProcessor.java:78-84)
    m = tdf.read_manifest(_enc([1], kas=("https://kas1", "https://kas2")))
    urls = [ka["url"] for ka in m["encryptionInformation"]["keyAccess"]]
    assert urls == ["https://kas1", "https://kas2"]


def test_no_attrs_raises_tdf_error():
    # no data attributes → failure route (AbstractToProcessor.java:94-101)
    with pytest.raises(tdf.TdfError):
        _enc([1], attrs=())
    with pytest.raises(tdf.TdfError):
        tdf.resolve_data_attributes("")
    with pytest.raises(tdf.TdfError):
        tdf.resolve_data_attributes(" , ,")


def test_kas_resolution_override_and_default():
    # row attribute overrides property default (ConvertToZTDFTest.java:54-55)
    assert tdf.resolve_kas_urls("https://kas2", "https://kas1") == ["https://kas2"]
    assert tdf.resolve_kas_urls(None, "https://kas1") == ["https://kas1"]
    assert tdf.resolve_kas_urls("a, b,,c", None) == ["a", "b", "c"]
    with pytest.raises(tdf.TdfError):
        tdf.resolve_kas_urls(None, None)


def test_policy_binding_tamper_detected():
    blob = bytearray(_enc([9, 9]))
    m = tdf.read_manifest(bytes(blob))
    # tamper: swap the policy for a different attribute set
    enc = m["encryptionInformation"]
    evil = {"uuid": "00", "body": {"dataAttributes": ["https://evil"]}}
    enc["policy"] = base64.b64encode(json.dumps(evil, sort_keys=True, separators=(",", ":")).encode()).decode()
    import struct as _s

    mbytes = json.dumps(m, separators=(",", ":")).encode()
    orig_mlen = _s.unpack("<I", bytes(blob[5:9]))[0]
    tampered = tdf.ZTDF_MAGIC + _s.pack("<I", len(mbytes)) + mbytes + bytes(blob[9 + orig_mlen :])
    with pytest.raises(tdf.TdfError):
        tdf.decrypt_ztdf(tampered, master_secret=MASTER)


def test_corrupt_ciphertext_fails_decrypt():
    # flipped byte → row-level failure (ConvertFromZTDF.java:88-91)
    blob = bytearray(_enc(list(range(16))))
    blob[-1] ^= 0xFF
    with pytest.raises(Exception):
        tdf.decrypt_ztdf(bytes(blob), master_secret=MASTER)


ASSERTION_DOC = {
    "id": "1111",
    "type": "handling",
    "scope": "payload",
    "appliesToState": "unencrypted",
    "statement": {"value": "a test assertion", "format": "sample"},
}


def test_assertion_parse_full_roundtrip():
    # typed config round trip (ConvertToZTDFTest.java:99-148)
    a = tdf.parse_assertion(dict(ASSERTION_DOC))
    assert (a.id, a.type, a.scope, a.appliesToState) == ("1111", "handling", "payload", "unencrypted")
    assert (a.statement_value, a.statement_format) == ("a test assertion", "sample")
    m = tdf.read_manifest(_enc([1], assertions=[a]))
    assert m["assertions"][0] == a.to_manifest()


@pytest.mark.parametrize("missing", ["scope", "statement", "appliesToState", "type"])
def test_assertion_required_fields(missing):
    doc = dict(ASSERTION_DOC)
    del doc[missing]
    with pytest.raises(tdf.TdfError, match=missing):
        tdf.parse_assertion(doc)


def test_assertion_statement_format_required():
    doc = dict(ASSERTION_DOC)
    doc["statement"] = {"value": "x"}
    with pytest.raises(tdf.TdfError, match="statement.format"):
        tdf.parse_assertion(doc)


@pytest.mark.parametrize(
    "field,bad", [("type", "weird"), ("scope", "everything"), ("appliesToState", "both")]
)
def test_assertion_enum_domains(field, bad):
    # enum domains from ConvertToZTDF.java:128-133
    doc = dict(ASSERTION_DOC)
    doc[field] = bad
    with pytest.raises(tdf.TdfError):
        tdf.parse_assertion(doc)


def test_assertions_json_column_parse():
    assert tdf.parse_assertions_json(None) == []
    assert tdf.parse_assertions_json("") == []
    out = tdf.parse_assertions_json(json.dumps([ASSERTION_DOC]))
    assert len(out) == 1 and out[0].id == "1111"
    with pytest.raises(tdf.TdfError):
        tdf.parse_assertions_json("{not json")


def test_assertion_rs256_signing():
    # sign-assertions path (ConvertToZTDF.java:248-261)
    from cryptography.hazmat.primitives import serialization
    from cryptography.hazmat.primitives.asymmetric import rsa

    key = rsa.generate_private_key(public_exponent=65537, key_size=2048)
    pem = key.private_bytes(
        serialization.Encoding.PEM,
        serialization.PrivateFormat.PKCS8,
        serialization.NoEncryption(),
    )
    a = tdf.parse_assertion(dict(ASSERTION_DOC))
    m = tdf.read_manifest(_enc([1], assertions=[a], signing_key_pem=pem))
    assert m["assertions"][0]["binding"]["method"] == "jws"
    assert len(base64.b64decode(m["assertions"][0]["binding"]["signature"])) == 256


def test_nano_roundtrip_and_policy():
    toks = [5, 6, 7]
    blob = tdf.encrypt_nano(
        tdf.serialize_tokens(toks),
        doc_id="d",
        lsn=1,
        kas_urls=["https://kas1"],
        data_attributes=["https://a/attr/x/value/y", "https://a/attr/x/value/z"],
        master_secret=MASTER,
    )
    assert tdf.deserialize_tokens(tdf.decrypt_nano(blob, master_secret=MASTER)) == toks
    assert tdf.nano_policy_attributes(blob) == [
        "https://a/attr/x/value/y",
        "https://a/attr/x/value/z",
    ]


def test_nano_size_gate():
    # MAX_SIZE = 16777218 (ConvertToNanoTDF.java:72); oversize → error routed
    # to exceeds_size_limit Spark-side (gate also enforced here defensively)
    big = b"\0" * (NANO_MAX_SIZE + 4)
    with pytest.raises(tdf.TdfError, match="exceeds_size_limit"):
        tdf.encrypt_nano(
            big, doc_id="d", lsn=1, kas_urls=["k"], data_attributes=["a"], master_secret=MASTER
        )


def test_settings_validation():
    # missing values → enable fails (SimpleOpenTDFControllerServiceTest.java:44-68)
    with pytest.raises(ConfigurationError):
        Settings(platform_endpoint="")
    with pytest.raises(ConfigurationError):
        Settings(client_secret="")
    with pytest.raises(ConfigurationError):
        Settings(sign_assertions=True)
    s = Settings()
    assert s.fingerprint() == Settings().fingerprint()


def test_settings_from_env_container_and_wrap(monkeypatch):
    # env-driven deploys (spark-submit --conf spark.executorEnv.*) can select
    # the spec container + RSA wrap without code changes
    monkeypatch.setenv("ZTDF_CONTAINER_FORMAT", "zip")
    monkeypatch.setenv("ZTDF_WRAP_MODE", "rsa-oaep")
    s = Settings.from_env()
    assert s.container_format == "zip" and s.wrap_mode == "rsa-oaep"
    monkeypatch.setenv("ZTDF_CONTAINER_FORMAT", "frame")
    monkeypatch.setenv("ZTDF_WRAP_MODE", "kek")
    assert Settings.from_env().fingerprint() != s.fingerprint()
    monkeypatch.setenv("ZTDF_WRAP_MODE", "bogus")
    with pytest.raises(ConfigurationError):
        Settings.from_env()


def _rsa_pem():
    from cryptography.hazmat.primitives import serialization
    from cryptography.hazmat.primitives.asymmetric import rsa

    key = rsa.generate_private_key(public_exponent=65537, key_size=2048)
    priv = key.private_bytes(
        serialization.Encoding.PEM,
        serialization.PrivateFormat.PKCS8,
        serialization.NoEncryption(),
    )
    pub = key.public_key().public_bytes(
        serialization.Encoding.PEM, serialization.PublicFormat.SubjectPublicKeyInfo
    )
    return priv, pub


def test_decrypt_verifies_assertion_bindings():
    """Decrypt-side assertion verification (the toggle the reference exposes
    and always disables, ConvertFromZTDF.java:76 — working here): a signed
    round trip verifies; a tampered assertion statement fails the record."""
    priv, pub = _rsa_pem()
    a = tdf.parse_assertion(dict(ASSERTION_DOC))
    blob = _enc([9, 8, 7], assertions=[a], signing_key_pem=priv)
    # verify with the public key and with the private key (public derived)
    for key_pem in (pub, priv):
        out = tdf.decrypt_ztdf(
            blob, master_secret=MASTER, verify_assertions=True, verification_key_pem=key_pem
        )
        assert tdf.deserialize_tokens(out) == [9, 8, 7]
    # tamper: flip the assertion statement inside the manifest
    m = tdf.read_manifest(blob)
    tampered_m = json.dumps(m, separators=(",", ":")).replace("a test assertion", "b test assertion").encode()
    import struct as _s

    mlen = _s.unpack("<I", blob[5:9])[0]
    tampered = tdf.ZTDF_MAGIC + _s.pack("<I", len(tampered_m)) + tampered_m + blob[9 + mlen:]
    with pytest.raises(tdf.TdfError, match="binding verification failed"):
        tdf.decrypt_ztdf(
            tampered, master_secret=MASTER, verify_assertions=True, verification_key_pem=pub
        )
    # tampering is invisible when verification is off (reference default)
    assert tdf.deserialize_tokens(tdf.decrypt_ztdf(tampered, master_secret=MASTER)) == [9, 8, 7]
    # unsigned assertion + verify on -> failure
    unsigned = _enc([1], assertions=[a])
    with pytest.raises(tdf.TdfError, match="no verifiable binding"):
        tdf.decrypt_ztdf(
            unsigned, master_secret=MASTER, verify_assertions=True, verification_key_pem=pub
        )
    with pytest.raises(tdf.TdfError, match="requires a verification key"):
        tdf.decrypt_ztdf(blob, master_secret=MASTER, verify_assertions=True)


def test_settings_verify_and_truststore_surface():
    from ztdf_spark.settings import ConfigurationError, Settings

    priv, pub = _rsa_pem()
    with pytest.raises(ConfigurationError, match="verification_key_pem"):
        Settings(verify_assertions=True)
    s = Settings(verify_assertions=True, verification_key_pem=pub)
    assert s.fingerprint() != Settings().fingerprint()
    # TLS surface: non-plaintext requires a PEM truststore
    with pytest.raises(ConfigurationError, match="truststore_pem"):
        Settings(use_plaintext=False)
    with pytest.raises(ConfigurationError, match="not PEM"):
        Settings(use_plaintext=False, truststore_pem=b"junk")
    s2 = Settings(use_plaintext=False, truststore_pem=pub)
    assert s2.fingerprint() != Settings().fingerprint()


def test_rewrap_rotates_kas_without_payload_change():
    blob = _enc([1, 2, 3], kas=("https://kas1",))
    rw = tdf.rewrap_ztdf(blob, master_secret=MASTER, kas_urls=["https://kas2", "https://kas3"])
    m = tdf.read_manifest(rw)
    assert [k["url"] for k in m["encryptionInformation"]["keyAccess"]] == ["https://kas2", "https://kas3"]
    # payload ciphertext region byte-identical
    import struct as _s

    for b in (blob, rw):
        pass
    mlen0 = _s.unpack("<I", blob[5:9])[0]
    mlen1 = _s.unpack("<I", rw[5:9])[0]
    assert blob[9 + mlen0:] == rw[9 + mlen1:]
    # decrypts via the NEW kas; old-only secret domain unchanged (same master)
    assert tdf.deserialize_tokens(tdf.decrypt_ztdf(rw, master_secret=MASTER)) == [1, 2, 3]
    # deterministic/idempotent: rewrap twice -> byte-identical
    assert tdf.rewrap_ztdf(rw, master_secret=MASTER, kas_urls=["https://kas2", "https://kas3"]) == rw
    # un-unwrappable envelope -> per-record error
    with pytest.raises(tdf.TdfError, match="unable to unwrap"):
        tdf.rewrap_ztdf(blob, master_secret=b"other-master-secret!", kas_urls=["https://kas2"])
    with pytest.raises(tdf.TdfError, match="no KAS URL"):
        tdf.rewrap_ztdf(blob, master_secret=MASTER, kas_urls=[])


def test_encryptor_per_call_sign_flag():
    """ZtdfEncryptor.encrypt(sign=...) toggles assertion bindings per call
    (per-row SIGN_ASSERTIONS); default follows key presence; signed and
    unsigned manifest templates cache independently."""
    from cryptography.hazmat.primitives import serialization
    from cryptography.hazmat.primitives.asymmetric import rsa

    key = rsa.generate_private_key(public_exponent=65537, key_size=2048)
    pem = key.private_bytes(
        serialization.Encoding.PEM, serialization.PrivateFormat.PKCS8, serialization.NoEncryption()
    )
    enc = tdf.ZtdfEncryptor(MASTER, pem)
    a = tdf.parse_assertion(dict(ASSERTION_DOC))
    kw = dict(doc_id="d", lsn=1, kas_urls=["https://kas1"],
              data_attributes=["https://a/attr/x/value/y"], assertions=(a,))
    m_on = tdf.read_manifest(enc.encrypt(tdf.serialize_tokens([1]), sign=True, **kw))
    m_off = tdf.read_manifest(enc.encrypt(tdf.serialize_tokens([1]), sign=False, **kw))
    m_default = tdf.read_manifest(enc.encrypt(tdf.serialize_tokens([1]), **kw))
    assert m_on["assertions"][0]["binding"]["method"] == "jws"
    assert "binding" not in m_off["assertions"][0]
    assert "binding" in m_default["assertions"][0]  # key present → signs
