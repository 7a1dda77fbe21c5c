"""Minimal ZIP container for spec-shaped ZTDF envelopes.

The on-disk ZTDF (TDF3) container defined by the public OpenTDF spec
(github.com/opentdf/spec, "Zero Trust Data Format") is a ZIP archive with
two entries: ``0.payload`` (the encrypted payload segments) and
``0.manifest.json`` (the JSON manifest). The reference processors emit that
layout through the OpenTDF Java SDK (``TDF.createTDF``,
/root/reference/nifi-tdf-processors/src/main/java/io/opentdf/nifi/
ConvertToZTDF.java:218 — note the ``application/ztdf+zip`` mime type set at
:228: the container IS a zip).

This module is a tiny, allocation-light ZIP writer/reader for that exact
shape, used by ``tdf.py``'s ``container="zip"`` mode:

- **Stored entries only** (method 0, no compression) — payload bytes are
  AES-GCM ciphertext (incompressible) and the manifest is small; this is
  also what makes per-row packing cheap enough for the vectorized encrypt
  UDF (two struct.pack headers + one zlib.crc32 per entry).
- **Deterministic bytes**: fixed DOS timestamp (1980-01-01), no extra
  fields, no comments — a replayed batch produces byte-identical
  containers, preserving the engine's idempotent-MERGE byte-stability
  (tdf.py module docstring).
- **Central-directory reads**: the reader locates the end-of-central-
  directory record and walks the central directory — the same access
  pattern a seekable SDK reader uses — rather than scanning local headers.
- No ZIP64: per-record token payloads are far below 4 GiB; oversize raises.

Interoperability boundary (same as tdf.py): the archive itself is a valid
ZIP readable by any zip tool (cross-checked against stdlib ``zipfile`` in
tests), and the manifest follows the public spec's field layout; the KAS
wrap inside ``wrappedKey`` remains the engine's local AES-KEK emulation of
a KAS RSA wrap (no SDK/network in this environment — SURVEY.md §1.2).
"""

from __future__ import annotations

import struct
import zlib

PAYLOAD_ENTRY = "0.payload"
MANIFEST_ENTRY = "0.manifest.json"

_LOCAL_SIG = b"PK\x03\x04"
_CENTRAL_SIG = b"PK\x01\x02"
_EOCD_SIG = b"PK\x05\x06"
_MAX_ENTRY = 0xFFFFFFFF - 1  # no ZIP64

# Fixed DOS date/time: 1980-01-01 00:00:00 (the ZIP epoch) — determinism.
_DOS_TIME = 0
_DOS_DATE = (0 << 9) | (1 << 5) | 1


class ZipFormatError(ValueError):
    """Malformed or unsupported ZIP container (surfaced per record by the
    decrypt UDF like any other TdfError-shaped failure)."""


def zip_pack(entries: list[tuple[str, bytes]]) -> bytes:
    """Pack ``entries`` (name, data) into a stored-only ZIP archive."""
    parts: list[bytes] = []
    central: list[bytes] = []
    offset = 0
    for name, data in entries:
        nbytes = name.encode()
        if len(data) > _MAX_ENTRY:
            raise ZipFormatError(f"entry {name!r} exceeds 4 GiB (no ZIP64)")
        crc = zlib.crc32(data) & 0xFFFFFFFF
        local = b"".join(
            [
                _LOCAL_SIG,
                struct.pack(
                    "<HHHHHIIIHH",
                    20,  # version needed to extract (2.0)
                    0,  # general purpose flags
                    0,  # method: stored
                    _DOS_TIME,
                    _DOS_DATE,
                    crc,
                    len(data),  # compressed size == size (stored)
                    len(data),
                    len(nbytes),
                    0,  # extra field length
                ),
                nbytes,
            ]
        )
        parts.append(local)
        parts.append(data)
        central.append(
            b"".join(
                [
                    _CENTRAL_SIG,
                    struct.pack(
                        "<HHHHHHIIIHHHHHII",
                        20,  # version made by
                        20,  # version needed
                        0,  # flags
                        0,  # method
                        _DOS_TIME,
                        _DOS_DATE,
                        crc,
                        len(data),
                        len(data),
                        len(nbytes),
                        0,  # extra len
                        0,  # comment len
                        0,  # disk number start
                        0,  # internal attrs
                        0,  # external attrs
                        offset,  # local header offset
                    ),
                    nbytes,
                ]
            )
        )
        offset += len(local) + len(data)
    cd = b"".join(central)
    eocd = b"".join(
        [
            _EOCD_SIG,
            struct.pack(
                "<HHHHIIH",
                0,  # this disk
                0,  # cd start disk
                len(entries),
                len(entries),
                len(cd),
                offset,  # cd offset
                0,  # comment length
            ),
        ]
    )
    return b"".join(parts) + cd + eocd


def is_zip(blob: bytes) -> bool:
    return blob[:4] == _LOCAL_SIG


def zip_entries(blob: bytes) -> dict[str, bytes]:
    """Read every stored entry via the central directory. Raises
    ZipFormatError on anything malformed or compressed."""
    eocd_at = blob.rfind(_EOCD_SIG)
    if eocd_at < 0:
        raise ZipFormatError("no end-of-central-directory record")
    try:
        (_, _, n_entries, _, cd_size, cd_off, _) = struct.unpack_from("<HHHHIIH", blob, eocd_at + 4)
    except struct.error as e:
        raise ZipFormatError(f"truncated EOCD: {e}") from e
    out: dict[str, bytes] = {}
    pos = cd_off
    cd_end = cd_off + cd_size
    for _ in range(n_entries):
        if blob[pos : pos + 4] != _CENTRAL_SIG or pos + 46 > len(blob):
            raise ZipFormatError("bad central directory entry")
        (
            _vmade,
            _vneed,
            _flags,
            method,
            _t,
            _d,
            crc,
            csize,
            usize,
            nlen,
            xlen,
            clen,
            _disk,
            _iattr,
            _eattr,
            loc_off,
        ) = struct.unpack_from("<HHHHHHIIIHHHHHII", blob, pos + 4)
        name = blob[pos + 46 : pos + 46 + nlen].decode("utf-8", "replace")
        pos += 46 + nlen + xlen + clen
        if method != 0:
            raise ZipFormatError(f"entry {name!r}: unsupported method {method} (stored only)")
        if csize != usize:
            raise ZipFormatError(f"entry {name!r}: stored entry with csize != size")
        # the local header's name/extra lengths can differ from the central
        # record's; offsets must come from the local header itself
        if blob[loc_off : loc_off + 4] != _LOCAL_SIG:
            raise ZipFormatError(f"entry {name!r}: bad local header offset")
        (l_nlen, l_xlen) = struct.unpack_from("<HH", blob, loc_off + 26)
        data_at = loc_off + 30 + l_nlen + l_xlen
        data = blob[data_at : data_at + usize]
        if len(data) != usize:
            raise ZipFormatError(f"entry {name!r}: truncated data")
        if (zlib.crc32(data) & 0xFFFFFFFF) != crc:
            raise ZipFormatError(f"entry {name!r}: CRC mismatch")
        out[name] = data
    if pos != cd_end:
        raise ZipFormatError("central directory size mismatch")
    return out


def zip_read(blob: bytes, name: str) -> bytes:
    entries = zip_entries(blob)
    try:
        return entries[name]
    except KeyError:
        raise ZipFormatError(f"missing entry {name!r}") from None
