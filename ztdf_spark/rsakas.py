"""Deterministic per-KAS RSA-2048 keys and a real RSA-OAEP(SHA-1) DEK wrap.

The OpenTDF SDK wraps each record's DEK for a KAS with
``RSA/ECB/OAEPWithSHA-1AndMGF1Padding`` under the KAS's published RSA-2048
public key (public spec + SDKs, github.com/opentdf/spec; the reference
delegates the wrap to the SDK inside ConvertToZTDF.java:218). This engine
has no SDK or network, so the KAS key pair derives deterministically from
``(master_secret, kas_url)`` — exactly the emulation boundary ``nano.py``
already uses for its P-256 KAS key (``kas_ec_private_key``) — but the wrap
itself is a REAL RSAES-OAEP encryption: a real KAS loaded with the same
private key (exportable via :func:`kas_rsa_private_pem`) unwraps it with a
stock OAEP decrypt. Tests cross-validate both directions against
``cryptography``'s OAEP (our ciphertexts open under its decrypt; its
randomized ciphertexts open under ours).

Replay determinism — the engine's byte-identical-envelope property that
makes MERGE replay idempotent — comes from an explicitly seeded OAEP
encoder. RSAES-OAEP *decoding* recovers the seed from the encoded message
and never requires it to have been random, so any conforming decrypter
accepts these ciphertexts. The seed is derived from secret material
(DEK ‖ url ‖ policy), keeping it unpredictable to an attacker — the same
argument as the engine's ctx-derived GCM IVs.

Key generation is pure-Python Miller-Rabin over a SHA-256 counter DRBG:
trial-division residues against a 20k sieve reject ~90% of candidates
without a modexp; a confirmed 1024-bit prime costs ~40 modexps
(~4 ms each on CPython), so a 2048-bit key pair takes well under a second,
once per ``(master_secret, kas_url)`` per process (LRU-cached — the same
lazy per-worker pattern as the reference's SDK singleton,
AbstractTDFProcessor.java:83-90).
"""

from __future__ import annotations

import hashlib
from functools import lru_cache

from cryptography.hazmat.primitives import hashes, serialization
from cryptography.hazmat.primitives.asymmetric import padding, rsa

_E = 65537
_KEY_BITS = 2048
#: byte length of an RSA-OAEP wrappedKey — distinguishes it from the 60-byte
#: AES-KEK wrap (12-byte iv ‖ 32-byte key ‖ 16-byte tag) when decrypt sniffs
#: the wrap mode per keyAccess entry.
WRAPPED_LEN = _KEY_BITS // 8
_HLEN = 20  # SHA-1 digest size (OAEP hash + MGF1 hash)
#: max plaintext an OAEP-2048/SHA-1 block can carry; the 32-byte DEK fits.
MAX_WRAP_LEN = WRAPPED_LEN - 2 * _HLEN - 2

_OAEP_SHA1 = padding.OAEP(
    mgf=padding.MGF1(hashes.SHA1()), algorithm=hashes.SHA1(), label=None
)


class RsaWrapError(ValueError):
    """OAEP unwrap failure (wrong key, tampered or malformed ciphertext)."""


def _primes_upto(limit: int) -> list[int]:
    sieve = bytearray([1]) * limit
    sieve[0:2] = b"\x00\x00"
    for i in range(2, int(limit**0.5) + 1):
        if sieve[i]:
            sieve[i * i :: i] = bytearray(len(range(i * i, limit, i)))
    return [i for i in range(limit) if sieve[i]]


_SMALL_PRIMES = _primes_upto(20000)


class _Drbg:
    """SHA-256 counter-mode byte stream — deterministic per seed."""

    def __init__(self, seed: bytes):
        self._seed = seed
        self._ctr = 0
        self._buf = b""

    def take(self, n: int) -> bytes:
        while len(self._buf) < n:
            self._buf += hashlib.sha256(
                self._seed + self._ctr.to_bytes(8, "big")
            ).digest()
            self._ctr += 1
        out, self._buf = self._buf[:n], self._buf[n:]
        return out

    def below(self, n: int) -> int:
        # 8 extra bytes make the mod bias negligible (< 2^-64)
        return int.from_bytes(self.take((n.bit_length() + 7) // 8 + 8), "big") % n


def _is_probable_prime(n: int, g: _Drbg, rounds: int = 40) -> bool:
    d, r = n - 1, 0
    while d % 2 == 0:
        d //= 2
        r += 1
    for _ in range(rounds):
        a = 2 + g.below(n - 3)
        x = pow(a, d, n)
        if x == 1 or x == n - 1:
            continue
        for _ in range(r - 1):
            x = (x * x) % n
            if x == n - 1:
                break
        else:
            return False
    return True


def _gen_prime(bits: int, g: _Drbg) -> int:
    while True:
        base = int.from_bytes(g.take(bits // 8), "big")
        # top two bits set → p*q is a full 2*bits product; low bit set → odd
        base |= (1 << (bits - 1)) | (1 << (bits - 2)) | 1
        residues = [base % p for p in _SMALL_PRIMES]
        # scan a window of odd offsets; sieve residues kill most candidates
        # without touching big-int arithmetic
        for step in range(0, 4096, 2):
            if any((r + step) % p == 0 for r, p in zip(residues, _SMALL_PRIMES)):
                continue
            cand = base + step
            if cand.bit_length() != bits or (cand - 1) % _E == 0:
                continue
            if _is_probable_prime(cand, g):
                return cand
        # window exhausted (astronomically unlikely) → redraw


@lru_cache(maxsize=64)
def kas_rsa_private_key(master_secret: bytes, kas_url: str) -> rsa.RSAPrivateKey:
    """The emulated KAS's RSA-2048 key pair, derived from (master, url) —
    the local stand-in for the KAS's published RSA public key (the RSA
    analog of nano.py's ``kas_ec_private_key``)."""
    g = _Drbg(
        hashlib.blake2b(
            master_secret + kas_url.encode(), person=b"ztdf-rsakas", digest_size=32
        ).digest()
    )
    p = _gen_prime(_KEY_BITS // 2, g)
    q = _gen_prime(_KEY_BITS // 2, g)
    if p == q:  # pragma: no cover - probability ~2^-1000
        raise RuntimeError("degenerate prime pair")
    if p < q:
        p, q = q, p
    n = p * q
    d = pow(_E, -1, (p - 1) * (q - 1))
    nums = rsa.RSAPrivateNumbers(
        p=p,
        q=q,
        d=d,
        dmp1=d % (p - 1),
        dmq1=d % (q - 1),
        iqmp=pow(q, -1, p),
        public_numbers=rsa.RSAPublicNumbers(_E, n),
    )
    return nums.private_key()


def kas_rsa_private_pem(master_secret: bytes, kas_url: str) -> bytes:
    """PKCS#8 PEM export of the derived KAS key — what a real KAS would be
    provisioned with so that envelopes wrapped here unwrap there."""
    return kas_rsa_private_key(master_secret, kas_url).private_bytes(
        serialization.Encoding.PEM,
        serialization.PrivateFormat.PKCS8,
        serialization.NoEncryption(),
    )


def _mgf1(seed: bytes, length: int) -> bytes:
    out = b""
    ctr = 0
    while len(out) < length:
        out += hashlib.sha1(seed + ctr.to_bytes(4, "big")).digest()
        ctr += 1
    return out[:length]


def oaep_wrap(pub: rsa.RSAPublicKey, data: bytes, seed: bytes) -> bytes:
    """RSAES-OAEP(SHA-1, MGF1-SHA-1, no label) with an explicit seed —
    RFC 8017 §7.1.1 encoding, deterministic for replay. ``seed`` must be
    ``_HLEN`` bytes of secret-derived pseudorandomness."""
    if len(seed) != _HLEN:
        raise ValueError(f"OAEP seed must be {_HLEN} bytes")
    if len(data) > MAX_WRAP_LEN:
        raise ValueError(f"OAEP payload exceeds {MAX_WRAP_LEN} bytes")
    k = WRAPPED_LEN
    lhash = hashlib.sha1(b"").digest()
    db = lhash + b"\x00" * (k - len(data) - 2 * _HLEN - 2) + b"\x01" + data
    db_mask = _mgf1(seed, k - _HLEN - 1)
    masked_db = bytes(a ^ b for a, b in zip(db, db_mask))
    seed_mask = _mgf1(masked_db, _HLEN)
    masked_seed = bytes(a ^ b for a, b in zip(seed, seed_mask))
    em = int.from_bytes(b"\x00" + masked_seed + masked_db, "big")
    nums = pub.public_numbers()
    return pow(em, nums.e, nums.n).to_bytes(k, "big")


def oaep_unwrap(priv: rsa.RSAPrivateKey, wrapped: bytes) -> bytes:
    """Stock OAEP decrypt (cryptography's C implementation — the hot decrypt
    path); raises :class:`RsaWrapError` on any mismatch so callers route it
    as a per-record failure."""
    if len(wrapped) != WRAPPED_LEN:
        raise RsaWrapError(f"RSA wrappedKey must be {WRAPPED_LEN} bytes")
    try:
        return priv.decrypt(wrapped, _OAEP_SHA1)
    except Exception as e:
        raise RsaWrapError(f"OAEP unwrap failed: {e}") from e
