"""Spec-shaped NanoTDF envelope (the ``container_format="zip"`` nano analog).

The public NanoTDF spec (github.com/opentdf/spec, nanotdf) defines a compact
binary container the reference emits via ``NanoTDF.createNanoTDF``
(/root/reference/nifi-tdf-processors/src/main/java/io/opentdf/nifi/
ConvertToNanoTDF.java:121; read at ConvertFromNanoTDF.java:51). Layout
implemented here, field for field:

    Header:
      magic+version   3 bytes  0x4C 0x31 0x4C  ("L1L")
      kas locator     1 byte protocol enum (0x00 http / 0x01 https)
                      + 1 byte body length + body (URL without scheme)
      ecc/binding     1 byte: bit7 USE_ECDSA_BINDING (0 → 8-byte GMAC
                      binding; 1 → 64-byte raw r||s ECDSA(SHA-256) by the
                      ephemeral key, RFC 6979 deterministic nonce),
                      bits0-2 ephemeral curve enum (0x00 = secp256r1)
      symmetric cfg   1 byte: bit7 HAS_SIGNATURE (0), bits0-3 cipher enum
                      (0x05 = AES-256-GCM, 128-bit tag)
      policy          1 byte type (0x01 = embedded plaintext) + u16 length
                      + body (policy JSON) + 8-byte GMAC binding
      ephemeral key   33 bytes (compressed P-256 point)
    Payload:
      length          3 bytes big-endian (= len(iv)+len(ct)+len(tag))
      iv              3 bytes (GCM nonce = 9 zero bytes || iv; 0x000000
                      reserved for the policy binding per spec)
      ciphertext+tag  AES-256-GCM

The symmetric key is a REAL ECDH agreement — ephemeral P-256 key against
the KAS's P-256 key, HKDF-SHA256 with salt = SHA-256 of the magic+version
bytes — i.e. the same construction the spec prescribes; the only emulation
is that the KAS key pair is derived locally from ``(master_secret,
kas_url)`` instead of fetched from a live KAS (no network here — the same
disclosed boundary as the ZTDF zip container's wrappedKey). The policy
binding is the trailing 8 bytes of a GMAC (AES-GCM with empty plaintext,
policy body as AAD, the reserved all-zero nonce) under the payload key.

Determinism: the ephemeral private scalar derives from the per-record ctx
(master, doc_id, lsn, payload digest, policy) exactly like the frame-mode
DEK (tdf.py module docstring) — replayed batches produce byte-identical
envelopes and no (key, nonce) pair ever repeats.
"""

from __future__ import annotations

import hashlib
import json
import struct
from typing import Iterable

from cryptography.exceptions import InvalidSignature
from cryptography.hazmat.primitives import hashes, serialization
from cryptography.hazmat.primitives.asymmetric import ec
from cryptography.hazmat.primitives.asymmetric.utils import (
    decode_dss_signature,
    encode_dss_signature,
)
from cryptography.hazmat.primitives.ciphers.aead import AESGCM
from cryptography.hazmat.primitives.kdf.hkdf import HKDF

from .settings import NANO_MAX_SIZE

NANO_SPEC_MAGIC = b"L1L"
_CURVE = ec.SECP256R1()
# order of P-256 (public curve parameter) for scalar reduction
_P256_N = 0xFFFFFFFF00000000FFFFFFFFFFFFFFFFBCE6FAADA7179E84F3B9CAC2FC632551

_PROTO_HTTP = 0x00
_PROTO_HTTPS = 0x01
_ECC_SECP256R1 = 0x00
_CIPHER_AES256GCM_128 = 0x05
_POLICY_EMBEDDED_PLAINTEXT = 0x01
_TAG_LEN = 16
_BINDING_LEN = 8  # GMAC binding: trailing 8 tag bytes
_ECDSA_BINDING_LEN = 64  # ECDSA binding: raw r||s, 32+32 big-endian
_USE_ECDSA_BINDING = 0x80  # ecc/binding mode byte, bit 7
_IV_LEN = 3


class NanoFormatError(ValueError):
    """Malformed spec-nano envelope (TdfError-shaped per-record failure)."""


def _h(*parts: bytes) -> bytes:
    h = hashlib.sha256()
    for p in parts:
        h.update(struct.pack("<I", len(p)))
        h.update(p)
    return h.digest()


def _scalar_from(seed: bytes) -> int:
    """Deterministic non-zero P-256 scalar from a 32-byte seed."""
    k = int.from_bytes(_h(b"nano-scalar", seed), "big") % (_P256_N - 1)
    return k + 1


def kas_ec_private_key(master_secret: bytes, kas_url: str) -> ec.EllipticCurvePrivateKey:
    """The emulated KAS's P-256 key pair, derived from (master, url) — the
    local stand-in for the KAS's published EC public key."""
    return ec.derive_private_key(
        _scalar_from(_h(b"nano-kas", master_secret, kas_url.encode())), _CURVE
    )


def _split_url(url: str) -> tuple[int, bytes]:
    if url.startswith("https://"):
        return _PROTO_HTTPS, url[8:].encode()
    if url.startswith("http://"):
        return _PROTO_HTTP, url[7:].encode()
    return _PROTO_HTTPS, url.encode()


def _join_url(proto: int, body: bytes) -> str:
    scheme = "https://" if proto == _PROTO_HTTPS else "http://"
    return scheme + body.decode()


def _hkdf_key(shared: bytes) -> bytes:
    """Payload key = HKDF-SHA256(shared ECDH secret), salt = SHA-256 of the
    magic+version bytes (the spec's key-derivation salt)."""
    return HKDF(
        algorithm=hashes.SHA256(),
        length=32,
        salt=hashlib.sha256(NANO_SPEC_MAGIC).digest(),
        info=b"",
    ).derive(shared)


def _policy_binding_gmac(key: bytes, policy_body: bytes) -> bytes:
    """GMAC over the policy body under the payload key with the reserved
    all-zero nonce (spec: IV 0x000000 is reserved for the policy); the
    binding field carries the trailing 8 bytes of the tag."""
    tag = AESGCM(key).encrypt(b"\x00" * 12, b"", policy_body)
    return tag[-_BINDING_LEN:]


def _compressed_point(pub: ec.EllipticCurvePublicKey) -> bytes:
    return pub.public_bytes(
        serialization.Encoding.X962, serialization.PublicFormat.CompressedPoint
    )


def _policy_binding_ecdsa(eph_priv: ec.EllipticCurvePrivateKey, policy_body: bytes) -> bytes:
    """ECDSA(SHA-256) over the policy body by the EPHEMERAL key (spec ECC
    mode bit 7): RFC 6979 deterministic nonce so replayed batches stay
    byte-identical; DER → raw r||s (32+32 big-endian) for the fixed-width
    binding field."""
    der = eph_priv.sign(
        policy_body, ec.ECDSA(hashes.SHA256(), deterministic_signing=True)
    )
    r, s = decode_dss_signature(der)
    return r.to_bytes(32, "big") + s.to_bytes(32, "big")


def _verify_binding_ecdsa(
    eph_pub: ec.EllipticCurvePublicKey, policy_body: bytes, binding: bytes
) -> bool:
    """Anyone holding only the HEADER can verify this binding (no key
    agreement needed) — the property the spec's ECDSA mode buys over GMAC."""
    try:
        der = encode_dss_signature(
            int.from_bytes(binding[:32], "big"), int.from_bytes(binding[32:], "big")
        )
        eph_pub.verify(der, policy_body, ec.ECDSA(hashes.SHA256()))
        return True
    except (InvalidSignature, ValueError):
        return False


def encrypt_nano_spec(
    payload: bytes,
    *,
    doc_id: str,
    lsn: int,
    kas_urls: Iterable[str],
    data_attributes: Iterable[str],
    master_secret: bytes,
    ecdsa_binding: bool = False,
) -> bytes:
    """Build a spec-layout NanoTDF: single effective KAS (first URL),
    embedded-plaintext policy of attribute FQNs, GMAC policy binding
    (or, with ``ecdsa_binding=True``, the spec's ECDSA mode — bit 7 of the
    ecc/binding byte; header-only verifiable, 64-byte r||s), ECDH-derived
    payload key (ConvertToNanoTDF semantics: KAS + attributes only, no
    assertions, ConvertToNanoTDF.java:97-121)."""
    from .tdf import TdfError, derive_ctx  # local import to avoid a cycle

    kas_urls = list(kas_urls)
    attrs = list(data_attributes)
    if not kas_urls:
        raise TdfError("no KAS URL provided via attribute or property")
    if not attrs:
        raise TdfError("no data attribute(s) provided")
    if len(payload) > NANO_MAX_SIZE:
        raise TdfError("exceeds_size_limit")

    # canonicalize BEFORE key derivation: decrypt reconstructs the URL from
    # the locator (scheme re-attached), so the KAS key must derive from the
    # same canonical form or a schemeless input would round-trip to a
    # different key
    proto, loc_body = _split_url(kas_urls[0])
    if len(loc_body) > 0xFF:
        raise TdfError("KAS URL too long for nano resource locator")
    kas_url = _join_url(proto, loc_body)
    policy_body = json.dumps(
        {"body": {"dataAttributes": attrs, "dissem": []}},
        sort_keys=True,
        separators=(",", ":"),
    ).encode()
    if len(policy_body) > 0xFFFF:
        raise TdfError("policy too large for nano envelope")

    ctx = derive_ctx(master_secret, doc_id, lsn, payload, policy_body)
    eph_priv = ec.derive_private_key(_scalar_from(_h(b"nano-eph", ctx)), _CURVE)
    kas_pub = kas_ec_private_key(master_secret, kas_url).public_key()
    key = _hkdf_key(eph_priv.exchange(ec.ECDH(), kas_pub))

    iv3 = _h(b"nano-iv", ctx)[:_IV_LEN]
    if iv3 == b"\x00\x00\x00":  # reserved for the policy binding
        iv3 = b"\x00\x00\x01"
    nonce = b"\x00" * 9 + iv3
    ct = AESGCM(key).encrypt(nonce, payload, None)

    if ecdsa_binding:
        ecc_mode = _USE_ECDSA_BINDING | _ECC_SECP256R1
        binding = _policy_binding_ecdsa(eph_priv, policy_body)
    else:
        ecc_mode = _ECC_SECP256R1
        binding = _policy_binding_gmac(key, policy_body)
    header = b"".join(
        [
            NANO_SPEC_MAGIC,
            bytes([proto, len(loc_body)]),
            loc_body,
            bytes([ecc_mode]),
            bytes([_CIPHER_AES256GCM_128]),  # bit7=0: no payload signature
            bytes([_POLICY_EMBEDDED_PLAINTEXT]),
            struct.pack(">H", len(policy_body)),
            policy_body,
            binding,
            _compressed_point(eph_priv.public_key()),
        ]
    )
    body = nonce[-_IV_LEN:] + ct
    if len(body) > 0xFFFFFF:
        raise TdfError("payload too large for nano length field")
    return header + struct.pack(">I", len(body))[1:] + body


def is_nano_spec(blob: bytes) -> bool:
    return blob[:3] == NANO_SPEC_MAGIC


def parse_nano_spec(blob: bytes) -> dict:
    """Walk the header; returns fields + offsets (shared by decrypt and the
    policy test hook). Raises NanoFormatError on malformed input."""
    try:
        if blob[:3] != NANO_SPEC_MAGIC:
            raise NanoFormatError("not a spec NanoTDF (bad magic)")
        off = 3
        proto, loc_len = blob[off], blob[off + 1]
        off += 2
        kas_url = _join_url(proto, blob[off : off + loc_len])
        off += loc_len
        ecc_mode = blob[off]
        sym_cfg = blob[off + 1]
        off += 2
        if ecc_mode & 0x07 != _ECC_SECP256R1:
            raise NanoFormatError(f"unsupported ephemeral curve {ecc_mode & 0x07}")
        ecdsa = bool(ecc_mode & _USE_ECDSA_BINDING)
        if sym_cfg & 0x0F != _CIPHER_AES256GCM_128:
            raise NanoFormatError(f"unsupported symmetric cipher {sym_cfg & 0x0F}")
        policy_type = blob[off]
        off += 1
        if policy_type != _POLICY_EMBEDDED_PLAINTEXT:
            raise NanoFormatError(f"unsupported policy type {policy_type}")
        (plen,) = struct.unpack_from(">H", blob, off)
        off += 2
        policy_body = blob[off : off + plen]
        off += plen
        binding_len = _ECDSA_BINDING_LEN if ecdsa else _BINDING_LEN
        binding = blob[off : off + binding_len]
        off += binding_len
        if len(binding) != binding_len:
            raise NanoFormatError("truncated policy binding")
        eph_point = blob[off : off + 33]
        off += 33
        if len(eph_point) != 33:
            raise NanoFormatError("truncated ephemeral key")
        body_len = int.from_bytes(blob[off : off + 3], "big")
        off += 3
        body = blob[off : off + body_len]
        if len(body) != body_len or len(body) < _IV_LEN + _TAG_LEN:
            raise NanoFormatError("truncated payload")
        return {
            "kas_url": kas_url,
            "policy_body": bytes(policy_body),
            "binding": bytes(binding),
            "ecdsa_binding": ecdsa,
            "ephemeral_point": bytes(eph_point),
            "iv": bytes(body[:_IV_LEN]),
            "ciphertext": bytes(body[_IV_LEN:]),
        }
    except (IndexError, struct.error) as e:
        raise NanoFormatError(f"truncated nano header: {e}") from e


def decrypt_nano_spec(blob: bytes, *, master_secret: bytes) -> bytes:
    """KAS-side open: ECDH(KAS private, ephemeral public) → HKDF → verify
    the policy GMAC binding → AES-GCM open. Any mismatch raises (per-record
    failure route, ConvertFromNanoTDF.java:57-63)."""
    from .tdf import TdfError

    f = parse_nano_spec(blob)
    eph_pub = ec.EllipticCurvePublicKey.from_encoded_point(_CURVE, f["ephemeral_point"])
    if f["ecdsa_binding"]:
        # header-only verification: no key agreement needed to reject a
        # tampered policy
        if not _verify_binding_ecdsa(eph_pub, f["policy_body"], f["binding"]):
            raise TdfError("nano policy binding verification failed")
    kas_priv = kas_ec_private_key(master_secret, f["kas_url"])
    key = _hkdf_key(kas_priv.exchange(ec.ECDH(), eph_pub))
    if not f["ecdsa_binding"] and _policy_binding_gmac(key, f["policy_body"]) != f["binding"]:
        raise TdfError("nano policy binding verification failed")
    nonce = b"\x00" * 9 + f["iv"]
    try:
        return AESGCM(key).decrypt(nonce, f["ciphertext"], None)
    except Exception as e:
        raise TdfError(f"nano payload decrypt failed: {e}") from e


def nano_spec_policy_attributes(blob: bytes) -> list[str]:
    """Read back the policy attribute FQNs (test hook, parallel to
    tdf.nano_policy_attributes for the frame layout)."""
    policy = json.loads(parse_nano_spec(blob)["policy_body"])
    return list(policy["body"]["dataAttributes"])
