"""Engine configuration — Spark analog of the NiFi controller service.

The reference's ``SimpleOpenTDFControllerService`` captures platform
endpoint / OIDC client id / client secret / usePlaintext on enable and
fails enablement when required values are missing
(/root/reference/nifi-tdf-processors/src/main/java/io/opentdf/nifi/
SimpleOpenTDFControllerService.java:36-95,115-141; POJO at
nifi-tdf-controller-services-api/src/main/java/io/opentdf/nifi/Config.java:4-53).

Here the same contract is a frozen dataclass validated at construction,
serialized into UDF closures once (executors get it via task pickling;
key material is derived lazily per Python worker — the Spark analog of the
reference's lazy per-process SDK singleton, AbstractTDFProcessor.java:139-161).
"""

from __future__ import annotations

import hashlib
import os
from dataclasses import dataclass, field

# NanoTDF hard size cap, 16 MiB + 2 bytes
# (/root/reference/nifi-tdf-processors/src/main/java/io/opentdf/nifi/
#  ConvertToNanoTDF.java:72, gate at :110-112)
NANO_MAX_SIZE = 16_777_218

ZTDF_MIME = "application/ztdf+zip"  # ConvertToZTDF.java:228
NANO_MIME = "application/nanotdf"

_DEFAULT_TEST_SECRET = b"ztdf-spark-local-kas-master-secret"


class ConfigurationError(ValueError):
    """Raised on invalid engine configuration (analog of NiFi's
    InitializationException on enable, SimpleOpenTDFControllerServiceTest.java:44-68)."""


@dataclass(frozen=True)
class Settings:
    """Validated engine configuration.

    ``platform_endpoint`` / ``client_id`` / ``client_secret`` mirror the
    controller-service properties; ``default_kas_url`` mirrors the
    processor-level ``KAS URL`` property that per-row ``kas_url`` attributes
    override (AbstractToProcessor.java:56-70).
    """

    platform_endpoint: str = "http://localhost:8080"
    client_id: str = "ztdf-spark"
    client_secret: str = field(default="local-secret", repr=False)
    use_plaintext: bool = True
    default_kas_url: str | None = "https://kas1.example.com"
    # bool, or a NiFi-EL template string evaluated PER ROW to a boolean —
    # the reference's one EL-bearing property (SIGN_ASSERTIONS,
    # AbstractTDFProcessor.java:123-129 via the :113-115 EL gate), e.g.
    # "${source:equals('web')}" signs only web-sourced records. Template
    # syntax is validated here; compilation happens in ops.encrypt_batch.
    sign_assertions: bool | str = False
    signing_key_pem: bytes | None = field(default=None, repr=False)
    master_secret: bytes = field(default=_DEFAULT_TEST_SECRET, repr=False)
    # decrypt-side RS256 assertion-binding verification. The reference
    # exposes the toggle and hard-disables it
    # (ConvertFromZTDF.java:76 withDisableAssertionVerification(true));
    # here it is a working flag: True verifies every signed assertion's
    # binding during decrypt (tamper → per-record failure). Verification
    # uses ``verification_key_pem`` (public) or the public half of
    # ``signing_key_pem``.
    verify_assertions: bool = False
    verification_key_pem: bytes | None = field(default=None, repr=False)
    # ZTDF on-disk container: "frame" = the engine's compact framing
    # (ZTDF1 | len | manifest | ciphertext — fastest, default);
    # "zip" = the public OpenTDF spec's layout (ZIP of 0.payload +
    # 0.manifest.json with GMAC segment integrity — what the reference's
    # SDK emits, ConvertToZTDF.java:218/:228). Decrypt auto-sniffs, so
    # mixed-container tables read fine.
    container_format: str = "frame"
    # ZTDF DEK wrap inside keyAccess.wrappedKey (spec container only):
    # "kek" = the engine's AES-KEK emulation (fastest, default); "rsa-oaep"
    # = the SDK's real RSA-OAEP(SHA-1) wrap under a per-KAS RSA-2048 key
    # derived from (master_secret, kas_url) — rsakas.py; a real KAS
    # provisioned with kas_rsa_private_pem() unwraps these with a stock
    # OAEP decrypt. Decrypt sniffs the mode per entry, so mixed tables
    # read in one pass.
    wrap_mode: str = "kek"
    # NanoTDF policy-binding mode for the spec container: False = GMAC
    # (8-byte tag under the payload key, the spec default); True = ECDSA
    # (64-byte r||s by the ephemeral key, spec ecc-mode bit 7 — verifiable
    # from the header alone, RFC 6979 deterministic). Only meaningful with
    # container_format="zip"; the frame container has no binding field.
    nano_ecdsa_binding: bool = False
    # TLS trust material for non-plaintext platform connections — the
    # analog of the reference's SSL Context Service truststore threading
    # (AbstractTDFProcessor.java:58-63,148-153; ConvertFromZTDFTest.java:58-85).
    # Offline engine: validated at construction, fingerprinted, and required
    # whenever use_plaintext=False.
    truststore_pem: bytes | None = field(default=None, repr=False)

    def __post_init__(self) -> None:
        missing = [
            name
            for name, v in (
                ("platform_endpoint", self.platform_endpoint),
                ("client_id", self.client_id),
                ("client_secret", self.client_secret),
            )
            if not v
        ]
        if missing:
            raise ConfigurationError(f"missing required settings: {missing}")
        if not self.master_secret:
            raise ConfigurationError("master_secret must be non-empty")
        if self.sign_assertions and not self.signing_key_pem:
            raise ConfigurationError(
                "sign_assertions requires signing_key_pem "
                "(reference: Private Key Controller Service, ConvertToZTDF.java:91-98)"
            )
        if isinstance(self.sign_assertions, str):
            from .el import ELSyntaxError, validate_template

            try:
                validate_template(self.sign_assertions)
            except ELSyntaxError as e:
                raise ConfigurationError(f"sign_assertions EL template invalid: {e}") from e
        if self.verify_assertions and not (self.verification_key_pem or self.signing_key_pem):
            raise ConfigurationError(
                "verify_assertions=True requires verification_key_pem (or signing_key_pem "
                "to derive the public half); reference toggle: ConvertFromZTDF.java:76"
            )
        if not self.use_plaintext and not self.truststore_pem:
            raise ConfigurationError(
                "use_plaintext=False requires truststore_pem (reference SSL Context "
                "Service threading, AbstractTDFProcessor.java:58-63)"
            )
        if self.truststore_pem is not None and b"-----BEGIN" not in self.truststore_pem:
            raise ConfigurationError("truststore_pem is not PEM data")
        if self.container_format not in ("frame", "zip"):
            raise ConfigurationError(
                f"container_format must be frame|zip, got {self.container_format!r}"
            )
        if self.nano_ecdsa_binding and self.container_format != "zip":
            raise ConfigurationError(
                "nano_ecdsa_binding=True requires container_format='zip' "
                "(the frame container has no policy-binding field)"
            )
        if self.wrap_mode not in ("kek", "rsa-oaep"):
            raise ConfigurationError(
                f"wrap_mode must be kek|rsa-oaep, got {self.wrap_mode!r}"
            )
        if self.wrap_mode == "rsa-oaep" and self.container_format != "zip":
            raise ConfigurationError(
                "wrap_mode='rsa-oaep' requires container_format='zip' "
                "(the RSA wrap is the spec container's keyAccess shape)"
            )

    @classmethod
    def from_env(cls, **overrides) -> "Settings":
        env = os.environ
        kwargs = dict(
            platform_endpoint=env.get("ZTDF_PLATFORM_ENDPOINT", "http://localhost:8080"),
            client_id=env.get("ZTDF_CLIENT_ID", "ztdf-spark"),
            client_secret=env.get("ZTDF_CLIENT_SECRET", "local-secret"),
            use_plaintext=env.get("ZTDF_USE_PLAINTEXT", "1") == "1",
            default_kas_url=env.get("ZTDF_DEFAULT_KAS_URL", "https://kas1.example.com"),
            master_secret=env.get("ZTDF_MASTER_SECRET", "").encode() or _DEFAULT_TEST_SECRET,
            container_format=env.get("ZTDF_CONTAINER_FORMAT", "frame"),
            wrap_mode=env.get("ZTDF_WRAP_MODE", "kek"),
        )
        kwargs.update(overrides)
        return cls(**kwargs)

    def fingerprint(self) -> str:
        """Stable id of the config (used in audit lineage rows)."""
        h = hashlib.sha256()
        h.update(self.platform_endpoint.encode())
        h.update(self.client_id.encode())
        h.update(self.master_secret)
        h.update(str(self.default_kas_url).encode())
        h.update(b"verify" if self.verify_assertions else b"noverify")
        h.update(self.container_format.encode())
        h.update(self.wrap_mode.encode())
        h.update(b"ecdsa" if self.nano_ecdsa_binding else b"gmac")
        h.update(self.truststore_pem or b"")
        return h.hexdigest()[:16]
