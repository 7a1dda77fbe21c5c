"""TDF-style envelope crypto core — pure Python, array-in / array-out.

Reproduces the *observable* semantics of the OpenTDF SDK calls made by the
reference processors (not their byte layout — SURVEY.md §1.2):

- ZTDF envelope: JSON manifest (per-KAS wrapped DEK key-access objects,
  policy of data-attribute FQNs, 0..n typed assertions, integrity hash)
  + AES-256-GCM ciphertext of the little-endian-serialized token array.
  Reference creation: ``TDF.createTDF`` at
  /root/reference/nifi-tdf-processors/src/main/java/io/opentdf/nifi/ConvertToZTDF.java:218;
  decryption: ``TDF.loadTDF`` + ``readPayload`` at ConvertFromZTDF.java:76-77.
- NanoTDF: compact binary header + payload, single KAS, no assertions,
  capped at 16 MiB + 2 (ConvertToNanoTDF.java:72,110-112; create at :121;
  read at ConvertFromNanoTDF.java:51).

Local KAS emulation: each KAS endpoint is emulated by an AES-256-GCM KEK
derived from ``(master_secret, kas_url)``; "wrapping the DEK for a KAS" is
an AES-GCM encryption of the DEK under that KEK with the policy JSON as
AAD (the TDF "policy binding" — tampering with policy breaks unwrap).

Determinism: DEK and all nonces are derived as SHA-256 of
``(master_secret, doc_id, lsn, SHA-256(payload), policy_bytes)`` so a
replayed batch produces byte-identical ciphertext — this makes the
idempotent MERGE byte-stable (SURVEY.md §4.4). Binding the payload digest
and policy into the derivation means a *different* payload or policy under
the same (doc_id, lsn) — replay with corrected content, two producers
colliding on an LSN — gets a fresh key+nonce pair, so AES-GCM nonce reuse
(keystream XOR / tag-forgery leaks) is impossible even when the
(doc_id, lsn)-uniqueness contract is violated upstream. The correctness
invariant vs the reference is token-array equality after a decrypt round
trip (BASELINE.json ``input_hint``), which random nonces would also
satisfy; determinism is an engine choice, not a format requirement.
"""

from __future__ import annotations

import base64
import hashlib
import hmac as _hmac
import json
import struct
from dataclasses import dataclass
from typing import Iterable, Sequence

import numpy as np
from cryptography.hazmat.primitives.ciphers.aead import AESGCM

from . import container as _zipc
from . import rsakas as _rsakas
from .settings import NANO_MAX_SIZE, ZTDF_MIME  # noqa: F401  (re-export)

ZTDF_MAGIC = b"ZTDF1"
NANO_MAGIC = b"NT01"

# --- spec-shaped ZIP container (container="zip") ---------------------------
# Field layout per the public OpenTDF spec (github.com/opentdf/spec):
# a ZIP archive of 0.payload + 0.manifest.json; encryptionInformation.type
# "split"; method AES-256-GCM streamable; integrityInformation with GMAC
# segment hashes + an HS256 root signature; keyAccess policyBinding =
# HS256 HMAC over the Base64 policy keyed with the DEK. The KAS wrap inside
# wrappedKey is selectable: wrap_mode="kek" (default) keeps this engine's
# AES-KEK emulation (iv || AES-GCM ciphertext, AAD = policy JSON);
# wrap_mode="rsa-oaep" emits the SDK's real RSA-OAEP(SHA-1) wrap under a
# per-KAS RSA-2048 key derived from (master_secret, kas_url) — see
# rsakas.py; the derived-not-fetched key material is the remaining
# emulation boundary (no SDK/network here; SURVEY.md §1.2). Decrypt sniffs
# the wrap per keyAccess entry by length (256-byte RSA vs 60-byte KEK), so
# mixed-mode tables read in one pass.
TDF_SPEC_VERSION = "4.3.0"
SEGMENT_SIZE_DEFAULT = 2 * 1024 * 1024
_SEG_OVERHEAD = 12 + 16  # per-segment iv + GCM tag


def _policy_binding(dek: bytes, policy_b64: str) -> dict:
    """keyAccess.policyBinding: Base64 of the hex HMAC-SHA256 digest of the
    Base64-encoded policy, keyed with the DEK (opentdf/spec keyAccess
    schema). Binds the policy to the key split: altering policy bytes
    without the DEK breaks the binding."""
    digest_hex = _hmac.new(dek, policy_b64.encode(), hashlib.sha256).hexdigest()
    return {"alg": "HS256", "hash": base64.b64encode(digest_hex.encode()).decode()}


def _encrypt_segments(
    dek: bytes, payload: bytes, ctx: bytes, seg_size: int = SEGMENT_SIZE_DEFAULT
) -> tuple[bytes, dict]:
    """Encrypt ``payload`` as spec-shaped streamable segments.

    Each encrypted segment is ``iv(12) || ciphertext || tag(16)``; its GMAC
    segment hash is the GCM tag itself (the spec's segmentHashAlg "GMAC");
    the root signature is HMAC-SHA256 over the concatenated segment-hash
    bytes, keyed with the DEK. Segment IVs derive from the per-record ctx
    (deterministic replay, never reused: distinct ctx → distinct DEK+IVs).
    Returns (payload_bytes, integrityInformation dict).
    """
    aes = AESGCM(dek)
    enc_parts: list[bytes] = []
    segments: list[dict] = []
    aggregate = bytearray()
    n_seg = max(1, -(-len(payload) // seg_size))
    for i in range(n_seg):
        chunk = payload[i * seg_size : (i + 1) * seg_size]
        iv = derive_iv(ctx, label=b"seg%d" % i)
        enc = iv + aes.encrypt(iv, chunk, None)
        tag = enc[-16:]
        enc_parts.append(enc)
        aggregate += tag
        segments.append(
            {
                "hash": base64.b64encode(tag).decode(),
                "segmentSize": len(chunk),
                "encryptedSegmentSize": len(enc),
            }
        )
    root_sig = _hmac.new(dek, bytes(aggregate), hashlib.sha256).digest()
    integrity = {
        "rootSignature": {"alg": "HS256", "sig": base64.b64encode(root_sig).decode()},
        "segmentHashAlg": "GMAC",
        "segmentSizeDefault": seg_size,
        "encryptedSegmentSizeDefault": seg_size + _SEG_OVERHEAD,
        "segments": segments,
    }
    return b"".join(enc_parts), integrity


def _zip_payload_descriptor() -> dict:
    return {
        "type": "reference",
        "url": _zipc.PAYLOAD_ENTRY,
        "protocol": "zip",
        "mimeType": "application/octet-stream",
        "isEncrypted": True,
    }


def _open_zip_envelope(blob: bytes) -> tuple[dict, bytes]:
    entries = _zipc.zip_entries(blob)
    try:
        manifest = json.loads(entries[_zipc.MANIFEST_ENTRY])
        payload = entries[_zipc.PAYLOAD_ENTRY]
    except KeyError as e:
        raise TdfError(f"ZTDF zip container missing entry: {e}") from e
    except json.JSONDecodeError as e:
        raise TdfError(f"bad manifest JSON: {e}") from e
    return manifest, payload

# ---------------------------------------------------------------------------
# Token-array payload serialization (the "content" bytes of a FlowFile)
# ---------------------------------------------------------------------------


def serialize_tokens(tokens: Sequence[int] | np.ndarray) -> bytes:
    """tokens array<int32> → little-endian int32 byte stream."""
    return np.asarray(tokens, dtype="<i4").tobytes()


def deserialize_tokens(payload: bytes) -> list[int]:
    return np.frombuffer(payload, dtype="<i4").tolist()


# ---------------------------------------------------------------------------
# Attribute / KAS resolution (AbstractToProcessor semantics)
# ---------------------------------------------------------------------------


class TdfError(ValueError):
    """Per-record conversion error → routed to 'failure', never raised
    across a batch (reference per-record try/catch, ConvertToZTDF.java:230-236)."""


def resolve_kas_urls(row_kas_url: str | None, default_kas_url: str | None) -> list[str]:
    """Row attribute overrides processor default; comma-split, drop empties,
    error if none (AbstractToProcessor.java:56-70). A whitespace-only row
    value counts as absent — matching the Catalyst pre-gate
    (``ops.resolved_kas``: nullif(trim(x), '')) so the gate and the UDF can
    never disagree on presence."""
    raw = row_kas_url if (row_kas_url and row_kas_url.strip()) else default_kas_url
    urls = [u.strip() for u in (raw or "").split(",") if u.strip()]
    if not urls:
        raise TdfError("no KAS URL provided via attribute or property")
    return urls


def resolve_data_attributes(row_attrs: str | None) -> list[str]:
    """Comma-split ``tdf_attribute``; error if empty
    (AbstractToProcessor.java:94-101; test ConvertToZTDFTest.java:49-50)."""
    attrs = [a.strip() for a in (row_attrs or "").split(",") if a.strip()]
    if not attrs:
        raise TdfError("no data attribute(s) provided")
    return attrs


# ---------------------------------------------------------------------------
# Assertions (ConvertToZTDF.java:128-178)
# ---------------------------------------------------------------------------

ASSERTION_TYPES = ("handling", "base")
ASSERTION_SCOPES = ("tdo", "payload")
ASSERTION_STATES = ("encrypted", "unencrypted")


@dataclass(frozen=True)
class Assertion:
    id: str
    type: str
    scope: str
    appliesToState: str
    statement_value: str
    statement_format: str

    def to_manifest(self) -> dict:
        return {
            "id": self.id,
            "type": self.type,
            "scope": self.scope,
            "appliesToState": self.appliesToState,
            "statement": {"value": self.statement_value, "format": self.statement_format},
        }


def parse_assertion(doc: dict, assertion_id: str | None = None) -> Assertion:
    """Validate one assertion JSON document.

    Required-field order and enum domains mirror ConvertToZTDF.java:145-178
    (scope, statement, statement.format, appliesToState, type) and the enum
    values at :128-133.
    """
    if "scope" not in doc:
        raise TdfError("assertion missing required field: scope")
    if "statement" not in doc or not isinstance(doc["statement"], dict):
        raise TdfError("assertion missing required field: statement")
    stmt = doc["statement"]
    if "format" not in stmt:
        raise TdfError("assertion missing required field: statement.format")
    if "appliesToState" not in doc:
        raise TdfError("assertion missing required field: appliesToState")
    if "type" not in doc:
        raise TdfError("assertion missing required field: type")
    if doc["type"] not in ASSERTION_TYPES:
        raise TdfError(f"assertion type must be one of {ASSERTION_TYPES}")
    if doc["scope"] not in ASSERTION_SCOPES:
        raise TdfError(f"assertion scope must be one of {ASSERTION_SCOPES}")
    if doc["appliesToState"] not in ASSERTION_STATES:
        raise TdfError(f"assertion appliesToState must be one of {ASSERTION_STATES}")
    return Assertion(
        id=str(doc.get("id", assertion_id or "")),
        type=doc["type"],
        scope=doc["scope"],
        appliesToState=doc["appliesToState"],
        statement_value=str(stmt.get("value", "")),
        statement_format=str(stmt["format"]),
    )


def parse_assertions_json(assertions_json: str | None) -> list[Assertion]:
    """Parse the ``assertions`` column: a JSON array of assertion docs
    (the columnar analog of 0..n ``tdf_assertion_<id>`` FlowFile attributes,
    AbstractToProcessor.java:22, ConvertToZTDF.java:206-210)."""
    if not assertions_json:
        return []
    try:
        docs = json.loads(assertions_json)
    except json.JSONDecodeError as e:
        raise TdfError(f"invalid assertions JSON: {e}") from e
    if isinstance(docs, dict):
        docs = [docs]
    return [parse_assertion(d) for d in docs]


# ---------------------------------------------------------------------------
# Key derivation (local KAS emulation)
# ---------------------------------------------------------------------------


def _h(*parts: bytes) -> bytes:
    h = hashlib.sha256()
    for p in parts:
        h.update(struct.pack("<I", len(p)))
        h.update(p)
    return h.digest()


def kek_for_kas(master_secret: bytes, kas_url: str) -> bytes:
    """Per-KAS key-encryption key (the emulated KAS's private key)."""
    return _h(b"ztdf-kek", master_secret, kas_url.encode())


def _rsa_wrap_dek(master_secret: bytes, url: str, dek: bytes, policy_bytes: bytes) -> bytes:
    """256-byte RSA-OAEP(SHA-1) wrap of the DEK under the derived per-KAS
    RSA-2048 public key (rsakas.py). The OAEP seed derives from secret
    material (DEK ‖ url ‖ policy) — unpredictable to attackers, but pinned,
    so replayed batches stay byte-identical (idempotent MERGE)."""
    pub = _rsakas.kas_rsa_private_key(master_secret, url).public_key()
    seed = _h(b"ztdf-oaep-seed", dek, url.encode(), policy_bytes)[:20]
    return _rsakas.oaep_wrap(pub, dek, seed)


def _unwrap_key_access(master_secret: bytes, ka: dict, policy_bytes: bytes) -> bytes:
    """Unwrap one zip-container keyAccess entry, sniffing the wrap mode by
    length: 256 bytes → RSA-OAEP under the derived KAS key; otherwise the
    AES-KEK emulation (12-byte iv ‖ GCM ciphertext, AAD = policy JSON).
    Raises on mismatch → caller treats it as a per-record/next-KAS failure."""
    wk = base64.b64decode(ka["wrappedKey"])
    if len(wk) == _rsakas.WRAPPED_LEN:
        return _rsakas.oaep_unwrap(
            _rsakas.kas_rsa_private_key(master_secret, ka["url"]), wk
        )
    return AESGCM(kek_for_kas(master_secret, ka["url"])).decrypt(
        wk[:12], wk[12:], policy_bytes
    )


def derive_ctx(master_secret: bytes, doc_id: str, lsn: int, payload: bytes, policy: bytes) -> bytes:
    """Per-record derivation context. Binds the payload digest AND the policy
    bytes so that any change to content or policy under a reused (doc_id, lsn)
    yields an unrelated (DEK, IV) pair — no AES-GCM nonce reuse is reachable,
    while identical re-encryptions stay byte-deterministic (idempotent MERGE)."""
    return _h(
        b"ztdf-ctx",
        master_secret,
        doc_id.encode(),
        struct.pack("<q", lsn),
        hashlib.sha256(payload).digest(),
        policy,
    )


def derive_dek(ctx: bytes) -> bytes:
    return _h(b"ztdf-dek", ctx)


def derive_iv(ctx: bytes, label: bytes = b"payload") -> bytes:
    return _h(b"ztdf-iv", label, ctx)[:12]


def verify_assertion_rs256(assertion_doc: dict, verify_key_pem: bytes) -> None:
    """Verify one manifest assertion's RS256 binding (decrypt-side analog of
    the reference's assertion-verification toggle, ConvertFromZTDF.java:76 —
    which the reference always disables; here it actually works).

    ``verify_key_pem`` may be the public key or the private key (public half
    extracted). Raises TdfError on a missing binding or a bad signature —
    surfaced as a per-record failure by the decrypt UDF, never a task kill.
    """
    from cryptography.hazmat.primitives import hashes, serialization
    from cryptography.hazmat.primitives.asymmetric import padding

    binding = assertion_doc.get("binding")
    if not binding or binding.get("method") != "jws" or "signature" not in binding:
        raise TdfError("assertion has no verifiable binding")
    doc = {k: v for k, v in assertion_doc.items() if k != "binding"}
    msg = json.dumps(doc, sort_keys=True, separators=(",", ":")).encode()
    try:
        key = serialization.load_pem_public_key(verify_key_pem)
    except ValueError:
        key = serialization.load_pem_private_key(verify_key_pem, password=None).public_key()
    try:
        key.verify(base64.b64decode(binding["signature"]), msg, padding.PKCS1v15(), hashes.SHA256())
    except Exception as e:
        raise TdfError(f"assertion binding verification failed: {assertion_doc.get('id', '?')}") from e


def _sign_assertion_rs256(assertion: Assertion, signing_key_pem: bytes) -> str:
    """RS256 signature over the canonical assertion JSON
    (reference signing path: ConvertToZTDF.java:248-261)."""
    from cryptography.hazmat.primitives import hashes, serialization
    from cryptography.hazmat.primitives.asymmetric import padding

    key = serialization.load_pem_private_key(signing_key_pem, password=None)
    msg = json.dumps(assertion.to_manifest(), sort_keys=True, separators=(",", ":")).encode()
    sig = key.sign(msg, padding.PKCS1v15(), hashes.SHA256())
    return base64.b64encode(sig).decode()


# ---------------------------------------------------------------------------
# ZTDF envelope
# ---------------------------------------------------------------------------


def encrypt_ztdf(
    payload: bytes,
    *,
    doc_id: str,
    lsn: int,
    kas_urls: Iterable[str],
    data_attributes: Iterable[str],
    assertions: Sequence[Assertion] = (),
    master_secret: bytes,
    signing_key_pem: bytes | None = None,
    container: str = "frame",
    wrap_mode: str = "kek",
) -> bytes:
    """Build a ZTDF envelope.

    ``container="frame"`` (default): the engine's compact framing
    ``ZTDF1 | u32 manifest_len | manifest JSON | AES-256-GCM ciphertext``.
    ``container="zip"``: the public spec's on-disk layout — a ZIP archive
    of ``0.payload`` (GMAC-hashed streamable segments) + ``0.manifest.json``
    (split-type encryptionInformation, HS256 policy bindings, HS256 root
    signature) — the byte shape ``TDF.createTDF`` emits through the SDK
    (ConvertToZTDF.java:218, mime ``application/ztdf+zip`` at :228).

    Semantics parity in both containers: per-record DEK wrapped for each of
    1..n KAS endpoints (KASInfo list, AbstractToProcessor.java:78-84;
    Config.withKasInformation, ConvertToZTDF.java:204), policy of
    data-attribute FQNs (Config.withDataAttributes, :205), 0..n assertions
    optionally RS256-signed (:248-261).
    """
    kas_urls = list(kas_urls)
    attrs = list(data_attributes)
    if not kas_urls:
        raise TdfError("no KAS URL provided via attribute or property")
    if not attrs:
        raise TdfError("no data attribute(s) provided")
    if container not in ("frame", "zip"):
        raise TdfError(f"container must be frame|zip, got {container!r}")
    if wrap_mode not in ("kek", "rsa-oaep"):
        raise TdfError(f"wrap_mode must be kek|rsa-oaep, got {wrap_mode!r}")
    if wrap_mode == "rsa-oaep" and container != "zip":
        raise TdfError("wrap_mode='rsa-oaep' requires the spec container (container='zip')")

    policy = {"uuid": _h(b"policy", doc_id.encode())[:8].hex(), "body": {"dataAttributes": attrs}}
    policy_bytes = json.dumps(policy, sort_keys=True, separators=(",", ":")).encode()
    ctx = derive_ctx(master_secret, doc_id, lsn, payload, policy_bytes)
    dek = derive_dek(ctx)
    iv = derive_iv(ctx)

    adocs: list[dict] | None = None
    if assertions:
        adocs = []
        for a in assertions:
            d = a.to_manifest()
            if signing_key_pem is not None:
                d["binding"] = {"method": "jws", "signature": _sign_assertion_rs256(a, signing_key_pem)}
            adocs.append(d)

    if container == "zip":
        policy_b64 = base64.b64encode(policy_bytes).decode()
        key_access = []
        for i, url in enumerate(kas_urls):
            if wrap_mode == "rsa-oaep":
                wrapped = _rsa_wrap_dek(master_secret, url, dek, policy_bytes)
            else:
                kek = kek_for_kas(master_secret, url)
                wrap_iv = derive_iv(ctx, label=b"wrap%d" % i)
                wrapped = wrap_iv + AESGCM(kek).encrypt(wrap_iv, dek, policy_bytes)
            key_access.append(
                {
                    "type": "wrapped",
                    "url": url,
                    "protocol": "kas",
                    "wrappedKey": base64.b64encode(wrapped).decode(),
                    "policyBinding": _policy_binding(dek, policy_b64),
                }
            )
        payload_bytes, integrity = _encrypt_segments(dek, payload, ctx)
        manifest = {
            "schemaVersion": TDF_SPEC_VERSION,
            "payload": _zip_payload_descriptor(),
            "encryptionInformation": {
                "type": "split",
                "keyAccess": key_access,
                "method": {"algorithm": "AES-256-GCM", "isStreamable": True, "iv": ""},
                "integrityInformation": integrity,
                "policy": policy_b64,
            },
        }
        if adocs:
            manifest["assertions"] = adocs
        mbytes = json.dumps(manifest, separators=(",", ":")).encode()
        return _zipc.zip_pack([(_zipc.PAYLOAD_ENTRY, payload_bytes), (_zipc.MANIFEST_ENTRY, mbytes)])

    key_access = []
    for i, url in enumerate(kas_urls):
        kek = kek_for_kas(master_secret, url)
        wrap_iv = derive_iv(ctx, label=b"wrap%d" % i)
        wrapped = AESGCM(kek).encrypt(wrap_iv, dek, policy_bytes)
        key_access.append(
            {
                "type": "wrapped",
                "url": url,
                "protocol": "kas",
                "wrappedKey": base64.b64encode(wrapped).decode(),
                "iv": base64.b64encode(wrap_iv).decode(),
            }
        )

    ciphertext = AESGCM(dek).encrypt(iv, payload, None)
    manifest: dict = {
        "encryptionInformation": {
            "type": "split",
            "keyAccess": key_access,
            "policy": base64.b64encode(policy_bytes).decode(),
            "method": {"algorithm": "AES-256-GCM", "iv": base64.b64encode(iv).decode()},
            "integrityInformation": {
                "rootSignature": {
                    "alg": "HS256",
                    "sig": base64.b64encode(_h(b"integrity", dek, ciphertext)).decode(),
                }
            },
        },
        "payload": {
            "type": "reference",
            "protocol": "zip",
            "mimeType": "application/octet-stream",
            "isEncrypted": True,
        },
    }
    if adocs:
        manifest["assertions"] = adocs

    mbytes = json.dumps(manifest, separators=(",", ":")).encode()
    return b"".join([ZTDF_MAGIC, struct.pack("<I", len(mbytes)), mbytes, ciphertext])


class ZtdfEncryptor:
    """Hot-path ZTDF encryptor: byte-identical output to ``encrypt_ztdf``
    (pinned by tests), ~2-3× faster by caching everything that is constant
    per (kas_urls, data_attributes, assertions) context — KEK cipher
    objects, policy bytes, and a manifest JSON *template* with sentinel
    placeholders for the four per-row fields (wrapped keys, wrap IVs,
    payload IV, integrity sig). Per row only: 3 SHA-256 derivations,
    1 KEK-wrap + 1 payload AES-GCM, base64s, and template substitution.

    This is the per-worker singleton the UDF layer instantiates once per
    Python worker (the Spark analog of the reference's lazy SDK cache,
    AbstractTDFProcessor.java:139-161).
    """

    # per-worker caches are bounded: high-cardinality attribute/assertion
    # streams would otherwise grow these without limit inside long-lived
    # Python workers (cleared wholesale — contexts are cheap to rebuild)
    MAX_CACHE = 4096

    def __init__(
        self,
        master_secret: bytes,
        signing_key_pem: bytes | None = None,
        container: str = "frame",
        wrap_mode: str = "kek",
    ):
        import uuid as _uuid

        if container not in ("frame", "zip"):
            raise TdfError(f"container must be frame|zip, got {container!r}")
        if wrap_mode not in ("kek", "rsa-oaep"):
            raise TdfError(f"wrap_mode must be kek|rsa-oaep, got {wrap_mode!r}")
        if wrap_mode == "rsa-oaep" and container != "zip":
            raise TdfError("wrap_mode='rsa-oaep' requires the spec container (container='zip')")
        self.master = master_secret
        self.signing_pem = signing_key_pem
        self.container = container
        self.wrap_mode = wrap_mode
        self._keks: dict[str, AESGCM] = {}
        self._ctx: dict[tuple, tuple] = {}
        self._zip_ctx_cache: dict[tuple, tuple] = {}
        # sentinel nonce: template placeholders embed a fresh 128-bit random
        # hex string, so NO user-controlled value (assertion statements,
        # attribute FQNs, KAS URLs baked into the template via json.dumps)
        # can collide with a placeholder — str.replace is then injection-safe
        self._sent = _uuid.uuid4().hex

    def _kek(self, url: str) -> AESGCM:
        c = self._keks.get(url)
        if c is None:
            if len(self._keks) >= self.MAX_CACHE:
                self._keks.clear()
            c = self._keks[url] = AESGCM(kek_for_kas(self.master, url))
        return c

    def _context(self, kas_urls: tuple, attrs: tuple, assertions: tuple, sign: bool = True):
        key = (kas_urls, attrs, assertions, sign)
        ctx = self._ctx.get(key)
        if ctx is None:
            if len(self._ctx) >= self.MAX_CACHE:
                self._ctx.clear()
            # build the manifest once with sentinels, using the reference
            # implementation's exact layout
            sentinel_wrapped = [f"@{self._sent}:WK{i}@" for i in range(len(kas_urls))]
            sentinel_wiv = [f"@{self._sent}:WIV{i}@" for i in range(len(kas_urls))]
            policy = {
                "uuid": f"@{self._sent}:UUID@",
                "body": {"dataAttributes": list(attrs)},
            }
            # policy bytes vary only via uuid (doc-keyed); keep uuid per-row
            template_policy = json.dumps(policy, sort_keys=True, separators=(",", ":"))
            key_access = [
                {
                    "type": "wrapped",
                    "url": url,
                    "protocol": "kas",
                    "wrappedKey": sentinel_wrapped[i],
                    "iv": sentinel_wiv[i],
                }
                for i, url in enumerate(kas_urls)
            ]
            manifest: dict = {
                "encryptionInformation": {
                    "type": "split",
                    "keyAccess": key_access,
                    "policy": f"@{self._sent}:POLICY@",
                    "method": {"algorithm": "AES-256-GCM", "iv": f"@{self._sent}:IV@"},
                    "integrityInformation": {
                        "rootSignature": {"alg": "HS256", "sig": f"@{self._sent}:SIG@"}
                    },
                },
                "payload": {
                    "type": "reference",
                    "protocol": "zip",
                    "mimeType": "application/octet-stream",
                    "isEncrypted": True,
                },
            }
            if assertions:
                adocs = []
                for a in assertions:
                    d = a.to_manifest()
                    if sign and self.signing_pem is not None:
                        d["binding"] = {
                            "method": "jws",
                            "signature": _sign_assertion_rs256(a, self.signing_pem),
                        }
                    adocs.append(d)
                manifest["assertions"] = adocs
            template = json.dumps(manifest, separators=(",", ":"))
            ctx = (template_policy, template)
            self._ctx[key] = ctx
        return ctx

    def encrypt(
        self,
        payload: bytes,
        *,
        doc_id: str,
        lsn: int,
        kas_urls,
        data_attributes,
        assertions: Sequence[Assertion] = (),
        master_secret: bytes | None = None,  # signature-compat; must equal self.master
        signing_key_pem: bytes | None = None,  # signature-compat
        sign: bool | None = None,  # per-row SIGN_ASSERTIONS EL decision; None = key-present default
    ) -> bytes:
        kas_urls = tuple(kas_urls)
        attrs = tuple(data_attributes)
        if not kas_urls:
            raise TdfError("no KAS URL provided via attribute or property")
        if not attrs:
            raise TdfError("no data attribute(s) provided")
        do_sign = (self.signing_pem is not None) if sign is None else bool(sign)
        if self.container == "zip":
            return self._encrypt_zip(payload, doc_id, lsn, kas_urls, attrs, tuple(assertions), do_sign)
        template_policy, template = self._context(kas_urls, attrs, tuple(assertions), do_sign)

        policy_bytes = template_policy.replace(
            f"@{self._sent}:UUID@", _h(b"policy", doc_id.encode())[:8].hex()
        ).encode()
        ctx = derive_ctx(self.master, doc_id, lsn, payload, policy_bytes)
        dek = derive_dek(ctx)
        iv = derive_iv(ctx)

        m = template
        for i, url in enumerate(kas_urls):
            wrap_iv = derive_iv(ctx, label=b"wrap%d" % i)
            wrapped = self._kek(url).encrypt(wrap_iv, dek, policy_bytes)
            m = m.replace(f"@{self._sent}:WK{i}@", base64.b64encode(wrapped).decode())
            m = m.replace(f"@{self._sent}:WIV{i}@", base64.b64encode(wrap_iv).decode())
        ciphertext = AESGCM(dek).encrypt(iv, payload, None)
        m = m.replace(f"@{self._sent}:POLICY@", base64.b64encode(policy_bytes).decode())
        m = m.replace(f"@{self._sent}:IV@", base64.b64encode(iv).decode())
        m = m.replace(f"@{self._sent}:SIG@", base64.b64encode(_h(b"integrity", dek, ciphertext)).decode())
        mbytes = m.encode()
        return b"".join([ZTDF_MAGIC, struct.pack("<I", len(mbytes)), mbytes, ciphertext])

    def _zip_context(self, kas_urls: tuple, attrs: tuple, assertions: tuple, sign: bool):
        """Per-(kas, attrs, assertions) cache for the zip container: the
        policy JSON template (uuid sentinel) and pre-signed assertion docs
        (the RS256 signature is the expensive per-context constant)."""
        key = (kas_urls, attrs, assertions, sign)
        ctx = self._zip_ctx_cache.get(key)
        if ctx is None:
            if len(self._zip_ctx_cache) >= self.MAX_CACHE:
                self._zip_ctx_cache.clear()
            policy = {
                "uuid": f"@{self._sent}:UUID@",
                "body": {"dataAttributes": list(attrs)},
            }
            template_policy = json.dumps(policy, sort_keys=True, separators=(",", ":"))
            adocs: list[dict] | None = None
            if assertions:
                adocs = []
                for a in assertions:
                    d = a.to_manifest()
                    if sign and self.signing_pem is not None:
                        d["binding"] = {
                            "method": "jws",
                            "signature": _sign_assertion_rs256(a, self.signing_pem),
                        }
                    adocs.append(d)
            ctx = (template_policy, adocs)
            self._zip_ctx_cache[key] = ctx
        return ctx

    def _encrypt_zip(
        self, payload: bytes, doc_id: str, lsn: int, kas_urls: tuple, attrs: tuple,
        assertions: tuple, do_sign: bool,
    ) -> bytes:
        """Spec-shaped ZIP container build — byte-identical to
        ``encrypt_ztdf(..., container="zip")`` (pinned by tests)."""
        template_policy, adocs = self._zip_context(kas_urls, attrs, assertions, do_sign)
        policy_bytes = template_policy.replace(
            f"@{self._sent}:UUID@", _h(b"policy", doc_id.encode())[:8].hex()
        ).encode()
        ctx = derive_ctx(self.master, doc_id, lsn, payload, policy_bytes)
        dek = derive_dek(ctx)
        policy_b64 = base64.b64encode(policy_bytes).decode()
        binding = _policy_binding(dek, policy_b64)
        key_access = []
        for i, url in enumerate(kas_urls):
            if self.wrap_mode == "rsa-oaep":
                wrapped = _rsa_wrap_dek(self.master, url, dek, policy_bytes)
            else:
                wrap_iv = derive_iv(ctx, label=b"wrap%d" % i)
                wrapped = wrap_iv + self._kek(url).encrypt(wrap_iv, dek, policy_bytes)
            key_access.append(
                {
                    "type": "wrapped",
                    "url": url,
                    "protocol": "kas",
                    "wrappedKey": base64.b64encode(wrapped).decode(),
                    "policyBinding": binding,
                }
            )
        payload_bytes, integrity = _encrypt_segments(dek, payload, ctx)
        manifest = {
            "schemaVersion": TDF_SPEC_VERSION,
            "payload": _zip_payload_descriptor(),
            "encryptionInformation": {
                "type": "split",
                "keyAccess": key_access,
                "method": {"algorithm": "AES-256-GCM", "isStreamable": True, "iv": ""},
                "integrityInformation": integrity,
                "policy": policy_b64,
            },
        }
        if adocs:
            manifest["assertions"] = adocs
        mbytes = json.dumps(manifest, separators=(",", ":")).encode()
        return _zipc.zip_pack([(_zipc.PAYLOAD_ENTRY, payload_bytes), (_zipc.MANIFEST_ENTRY, mbytes)])


def rewrap_ztdf(blob: bytes, *, master_secret: bytes, kas_urls: Iterable[str]) -> bytes:
    """KAS key rotation: re-wrap the record's DEK for a NEW set of KAS
    endpoints WITHOUT touching the payload ciphertext (the 'rewrap'
    operation of the OpenTDF KAS protocol, applied at rest).

    The DEK is unwrapped via any current keyAccess entry, then wrapped for
    each new KAS; policy and payload bytes are byte-identical before/after.
    Wrap IVs derive from (DEK digest, url, policy) so rewrap is
    deterministic/idempotent and never reuses a nonce under a given KEK
    (distinct DEKs → distinct IVs). Works on both containers (auto-sniffed);
    in the zip container the payload entry is byte-identical before/after
    and each new keyAccess gets a freshly-computed spec policyBinding.
    """
    if _zipc.is_zip(blob):
        manifest, payload_bytes = _open_zip_envelope(blob)
        enc = manifest["encryptionInformation"]
        policy_b64 = enc["policy"]
        policy_bytes = base64.b64decode(policy_b64)
        dek = None
        rsa_mode = False
        last_err = None
        for ka in enc["keyAccess"]:
            try:
                dek = _unwrap_key_access(master_secret, ka, policy_bytes)
                # mode-preserving rotation: re-wrap under the same wrap mode
                # the envelope already carries
                rsa_mode = len(base64.b64decode(ka["wrappedKey"])) == _rsakas.WRAPPED_LEN
                break
            except Exception as e:
                last_err = e
        if dek is None:
            raise TdfError(f"rewrap: unable to unwrap DEK with any current KAS: {last_err}")
        urls = list(kas_urls)
        if not urls:
            raise TdfError("no KAS URL provided via attribute or property")
        dek_digest = hashlib.sha256(dek).digest()
        binding = _policy_binding(dek, policy_b64)

        def _rewrap_for(url: str) -> bytes:
            if rsa_mode:
                return _rsa_wrap_dek(master_secret, url, dek, policy_bytes)
            wrap_iv = _h(b"ztdf-rewrap-iv", dek_digest, url.encode(), policy_bytes)[:12]
            return wrap_iv + AESGCM(kek_for_kas(master_secret, url)).encrypt(
                wrap_iv, dek, policy_bytes
            )

        enc["keyAccess"] = [
            {
                "type": "wrapped",
                "url": url,
                "protocol": "kas",
                "wrappedKey": base64.b64encode(_rewrap_for(url)).decode(),
                "policyBinding": binding,
            }
            for url in urls
        ]
        mbytes = json.dumps(manifest, separators=(",", ":")).encode()
        return _zipc.zip_pack([(_zipc.PAYLOAD_ENTRY, payload_bytes), (_zipc.MANIFEST_ENTRY, mbytes)])
    if blob[:5] != ZTDF_MAGIC:
        raise TdfError("not a ZTDF envelope (bad magic)")
    (mlen,) = struct.unpack("<I", blob[5:9])
    manifest = json.loads(blob[9 : 9 + mlen])
    ciphertext = blob[9 + mlen :]
    enc = manifest["encryptionInformation"]
    policy_bytes = base64.b64decode(enc["policy"])
    dek = None
    last_err: Exception | None = None
    for ka in enc["keyAccess"]:
        try:
            dek = AESGCM(kek_for_kas(master_secret, ka["url"])).decrypt(
                base64.b64decode(ka["iv"]), base64.b64decode(ka["wrappedKey"]), policy_bytes
            )
            break
        except Exception as e:
            last_err = e
    if dek is None:
        raise TdfError(f"rewrap: unable to unwrap DEK with any current KAS: {last_err}")
    urls = list(kas_urls)
    if not urls:
        raise TdfError("no KAS URL provided via attribute or property")
    dek_digest = hashlib.sha256(dek).digest()
    key_access = []
    for url in urls:
        wrap_iv = _h(b"ztdf-rewrap-iv", dek_digest, url.encode(), policy_bytes)[:12]
        wrapped = AESGCM(kek_for_kas(master_secret, url)).encrypt(wrap_iv, dek, policy_bytes)
        key_access.append(
            {
                "type": "wrapped",
                "url": url,
                "protocol": "kas",
                "wrappedKey": base64.b64encode(wrapped).decode(),
                "iv": base64.b64encode(wrap_iv).decode(),
            }
        )
    enc["keyAccess"] = key_access
    mbytes = json.dumps(manifest, separators=(",", ":")).encode()
    return b"".join([ZTDF_MAGIC, struct.pack("<I", len(mbytes)), mbytes, ciphertext])


def read_manifest(blob: bytes) -> dict:
    if _zipc.is_zip(blob):
        return _open_zip_envelope(blob)[0]
    if blob[:5] != ZTDF_MAGIC:
        raise TdfError("not a ZTDF envelope (bad magic)")
    (mlen,) = struct.unpack("<I", blob[5:9])
    return json.loads(blob[9 : 9 + mlen])


def _decrypt_ztdf_zip(
    manifest: dict,
    payload_bytes: bytes,
    *,
    master_secret: bytes,
) -> bytes:
    """Open a spec-shaped zip envelope: unwrap the DEK, verify the policy
    binding, every segment GMAC, and the root signature, then decrypt and
    reassemble the segments. Any mismatch is a TdfError → per-record
    failure route, never a task kill."""
    enc = manifest["encryptionInformation"]
    policy_b64 = enc["policy"]
    policy_bytes = base64.b64decode(policy_b64)
    dek = None
    used_ka = None
    last_err: Exception | None = None
    for ka in enc["keyAccess"]:
        try:
            dek = _unwrap_key_access(master_secret, ka, policy_bytes)
            used_ka = ka
            break
        except Exception as e:
            last_err = e
    if dek is None:
        raise TdfError(f"unable to unwrap DEK with any KAS: {last_err}")
    binding = (used_ka.get("policyBinding") or {}).get("hash")
    if binding != _policy_binding(dek, policy_b64)["hash"]:
        raise TdfError("policy binding verification failed")
    integ = enc["integrityInformation"]
    aes = AESGCM(dek)
    parts: list[bytes] = []
    aggregate = bytearray()
    off = 0
    for seg in integ["segments"]:
        esz = int(seg["encryptedSegmentSize"])
        chunk = payload_bytes[off : off + esz]
        off += esz
        if len(chunk) != esz or esz < _SEG_OVERHEAD:
            raise TdfError("truncated payload segment")
        tag = chunk[-16:]
        if base64.b64encode(tag).decode() != seg["hash"]:
            raise TdfError("segment GMAC mismatch")
        aggregate += tag
        try:
            parts.append(aes.decrypt(chunk[:12], chunk[12:], None))
        except Exception as e:
            raise TdfError(f"segment decrypt failed: {e}") from e
    if off != len(payload_bytes):
        raise TdfError("payload length does not match segment table")
    root = base64.b64encode(_hmac.new(dek, bytes(aggregate), hashlib.sha256).digest()).decode()
    if root != integ["rootSignature"]["sig"]:
        raise TdfError("root signature mismatch")
    return b"".join(parts)


def decrypt_ztdf(
    blob: bytes,
    *,
    master_secret: bytes,
    verify_assertions: bool = False,
    verification_key_pem: bytes | None = None,
) -> bytes:
    """Unwrap the DEK via the (emulated) KAS named in the manifest, verify
    the policy binding, AES-GCM-open the payload.

    ``verify_assertions=False`` (default) matches the reference's
    ``withDisableAssertionVerification(true)`` (ConvertFromZTDF.java:76).
    With ``verify_assertions=True`` every manifest assertion's RS256 binding
    is checked against ``verification_key_pem`` BEFORE the payload opens —
    a tampered or unsigned assertion fails the record. Requires the full
    envelope in memory, like the reference's seekable in-memory channel
    (ConvertFromZTDF.java:73).

    Container is auto-sniffed: ``PK..`` → spec-shaped zip (segment GMACs,
    root signature, and policy binding all verified), ``ZTDF1`` → frame.
    """
    if _zipc.is_zip(blob):
        manifest, payload_bytes = _open_zip_envelope(blob)
        if verify_assertions:
            if verification_key_pem is None:
                raise TdfError("verify_assertions=True requires a verification key")
            for adoc in manifest.get("assertions", []):
                verify_assertion_rs256(adoc, verification_key_pem)
        return _decrypt_ztdf_zip(manifest, payload_bytes, master_secret=master_secret)
    if blob[:5] != ZTDF_MAGIC:
        raise TdfError("not a ZTDF envelope (bad magic)")
    (mlen,) = struct.unpack("<I", blob[5:9])
    manifest = json.loads(blob[9 : 9 + mlen])
    ciphertext = blob[9 + mlen :]
    if verify_assertions:
        if verification_key_pem is None:
            raise TdfError("verify_assertions=True requires a verification key")
        for adoc in manifest.get("assertions", []):
            verify_assertion_rs256(adoc, verification_key_pem)
    enc = manifest["encryptionInformation"]
    policy_bytes = base64.b64decode(enc["policy"])
    last_err: Exception | None = None
    for ka in enc["keyAccess"]:
        kek = kek_for_kas(master_secret, ka["url"])
        try:
            dek = AESGCM(kek).decrypt(
                base64.b64decode(ka["iv"]), base64.b64decode(ka["wrappedKey"]), policy_bytes
            )
            iv = base64.b64decode(enc["method"]["iv"])
            return AESGCM(dek).decrypt(iv, ciphertext, None)
        except Exception as e:  # try next KAS (split-key style fallback)
            last_err = e
    raise TdfError(f"unable to unwrap DEK with any KAS: {last_err}")


# ---------------------------------------------------------------------------
# NanoTDF envelope
# ---------------------------------------------------------------------------


def encrypt_nano(
    payload: bytes,
    *,
    doc_id: str,
    lsn: int,
    kas_urls: Iterable[str],
    data_attributes: Iterable[str],
    master_secret: bytes,
    container: str = "frame",
    ecdsa_binding: bool = False,
) -> bytes:
    """Compact binary envelope, single effective KAS (first URL), no
    assertions (NanoTDFConfig has KAS + attributes only,
    ConvertToNanoTDF.java:97-121).

    ``container="frame"`` (default): the engine's compact framing below.
    ``container="zip"`` (the spec-container setting, shared with ZTDF):
    the public NanoTDF spec's binary layout — L1L magic, resource-locator
    KAS, embedded plaintext policy with GMAC binding, compressed P-256
    ephemeral key, ECDH+HKDF payload key (see :mod:`ztdf_spark.nano`).

    Frame layout: ``NT01 | u16 kas_len | kas | u16 policy_len |
    policy(csv attrs) | iv(12) | u16 wrapped_len | wrapped_dek |
    ciphertext``.

    The 16 MiB + 2 size gate is enforced Spark-side *before* this function
    (ConvertToNanoTDF.java:110-112 routes oversize to ``exceeds_size_limit``
    without touching content); it is also re-checked here defensively.
    """
    if container == "zip":
        from .nano import encrypt_nano_spec

        return encrypt_nano_spec(
            payload,
            doc_id=doc_id,
            lsn=lsn,
            kas_urls=kas_urls,
            data_attributes=data_attributes,
            master_secret=master_secret,
            ecdsa_binding=ecdsa_binding,
        )
    if container != "frame":
        raise TdfError(f"container must be frame|zip, got {container!r}")
    if ecdsa_binding:
        raise TdfError("ecdsa_binding requires the spec container (container='zip')")
    kas_urls = list(kas_urls)
    attrs = list(data_attributes)
    if not kas_urls:
        raise TdfError("no KAS URL provided via attribute or property")
    if not attrs:
        raise TdfError("no data attribute(s) provided")
    if len(payload) > NANO_MAX_SIZE:
        raise TdfError("exceeds_size_limit")

    kas = kas_urls[0].encode()
    policy = ",".join(attrs).encode()
    ctx = derive_ctx(master_secret, doc_id, lsn, payload, policy)
    dek = derive_dek(ctx)
    iv = derive_iv(ctx, label=b"nano")
    wrap_iv = derive_iv(ctx, label=b"nanowrap")
    wrapped = AESGCM(kek_for_kas(master_secret, kas_urls[0])).encrypt(wrap_iv, dek, policy)
    ciphertext = AESGCM(dek).encrypt(iv, payload, None)
    return b"".join(
        [
            NANO_MAGIC,
            struct.pack("<H", len(kas)),
            kas,
            struct.pack("<H", len(policy)),
            policy,
            iv,
            wrap_iv,
            struct.pack("<H", len(wrapped)),
            wrapped,
            ciphertext,
        ]
    )


def decrypt_nano(blob: bytes, *, master_secret: bytes) -> bytes:
    """ConvertFromNanoTDF analog: whole-content read → plaintext
    (ConvertFromNanoTDF.java:44-63). Container auto-sniffed (``L1L`` spec
    magic vs ``NT01`` frame magic) so mixed-container tables decrypt in
    one pass, mirroring the ZTDF side."""
    from .nano import decrypt_nano_spec, is_nano_spec

    if is_nano_spec(blob):
        return decrypt_nano_spec(blob, master_secret=master_secret)
    if blob[:4] != NANO_MAGIC:
        raise TdfError("not a NanoTDF envelope (bad magic)")
    off = 4
    (kas_len,) = struct.unpack_from("<H", blob, off)
    off += 2
    kas = blob[off : off + kas_len].decode()
    off += kas_len
    (plen,) = struct.unpack_from("<H", blob, off)
    off += 2
    policy = blob[off : off + plen]
    off += plen
    iv = blob[off : off + 12]
    off += 12
    wrap_iv = blob[off : off + 12]
    off += 12
    (wlen,) = struct.unpack_from("<H", blob, off)
    off += 2
    wrapped = blob[off : off + wlen]
    off += wlen
    ciphertext = blob[off:]
    dek = AESGCM(kek_for_kas(master_secret, kas)).decrypt(wrap_iv, wrapped, bytes(policy))
    return AESGCM(dek).decrypt(iv, bytes(ciphertext), None)


def nano_policy_attributes(blob: bytes) -> list[str]:
    """Read back the policy attribute FQNs from a nano envelope (test hook).
    Container auto-sniffed like :func:`decrypt_nano`."""
    from .nano import is_nano_spec, nano_spec_policy_attributes

    if is_nano_spec(blob):
        return nano_spec_policy_attributes(blob)
    if blob[:4] != NANO_MAGIC:
        raise TdfError("not a NanoTDF envelope (bad magic)")
    off = 4
    (kas_len,) = struct.unpack_from("<H", blob, off)
    off += 2 + kas_len
    (plen,) = struct.unpack_from("<H", blob, off)
    off += 2
    return blob[off : off + plen].decode().split(",")
