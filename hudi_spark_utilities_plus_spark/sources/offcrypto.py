"""MS-OFFCRYPTO decryption for password-protected OOXML workbooks.

Reference parity (A3): the reference forwards ``workbookPassword`` to
spark-excel/POI (`docs/file/01.Excel Ingestion.md:47,114-119`), which
decrypts the encrypted-OOXML container. An encrypted ``.xlsx`` is an
OLE2 compound file with two streams: ``EncryptionInfo`` (how to derive
keys) and ``EncryptedPackage`` (the AES-encrypted plain ``.xlsx`` zip).
This module implements both encryption schemes of MS-OFFCRYPTO:

- **Agile** (version 4.4, Office 2010+): XML descriptor; iterated-hash
  password key (spinCount × SHA-1/256/384/512), per-purpose block keys,
  AES-CBC; the package is encrypted in 4096-byte segments whose IVs are
  ``Hash(keyDataSalt ‖ LE32(segment))``.
- **Standard** (versions 2.2/3.2/4.2, Office 2007): binary header;
  50 000 × SHA-1 password key with the 0x36/0x5C ipad/opad expansion,
  AES-ECB package encryption.

Both schemes carry a password VERIFIER, so a wrong password fails
loudly before any package bytes are touched. AES primitives come from
the ``cryptography`` package (present in this environment); everything
else is stdlib struct/XML/hashlib.
"""

from __future__ import annotations

import hashlib
import struct
import xml.etree.ElementTree as ET

from .biff import ole_streams

_ENC_NS = "{http://schemas.microsoft.com/office/2006/encryption}"
_PWD_NS = "{http://schemas.microsoft.com/office/2006/keyEncryptor/password}"

# MS-OFFCRYPTO 2.3.4.13 — fixed block keys for the password key encryptor
_BLK_VERIFIER_INPUT = bytes((0xFE, 0xA7, 0xD2, 0x76, 0x3B, 0x4B, 0x9E, 0x79))
_BLK_VERIFIER_VALUE = bytes((0xD7, 0xAA, 0x0F, 0x6D, 0x30, 0x61, 0x34, 0x4E))
_BLK_KEY_VALUE = bytes((0x14, 0x6E, 0x0B, 0xE7, 0xAB, 0xAC, 0xD0, 0xD6))

_HASHES = {
    "SHA1": hashlib.sha1,
    "SHA256": hashlib.sha256,
    "SHA384": hashlib.sha384,
    "SHA512": hashlib.sha512,
}


class WrongPasswordError(ValueError):
    """The workbookPassword failed the container's password verifier."""


def _rc4_keystream(key: bytes):
    """Pure-python RC4 keystream generator (streams here are ≤ a few
    hundred KB of driver-side workbook bytes — not a data-path cipher)."""
    s = list(range(256))
    j = 0
    for i in range(256):
        j = (j + s[i] + key[i % len(key)]) & 0xFF
        s[i], s[j] = s[j], s[i]
    i = j = 0
    while True:
        i = (i + 1) & 0xFF
        j = (j + s[i]) & 0xFF
        s[i], s[j] = s[j], s[i]
        yield s[(s[i] + s[j]) & 0xFF]


def _aes_cbc_decrypt(key: bytes, iv: bytes, data: bytes) -> bytes:
    from cryptography.hazmat.primitives.ciphers import Cipher, algorithms, modes

    dec = Cipher(algorithms.AES(key), modes.CBC(iv)).decryptor()
    return dec.update(data) + dec.finalize()


def _aes_ecb_decrypt(key: bytes, data: bytes) -> bytes:
    from cryptography.hazmat.primitives.ciphers import Cipher, algorithms, modes

    dec = Cipher(algorithms.AES(key), modes.ECB()).decryptor()
    return dec.update(data) + dec.finalize()


def is_encrypted_ooxml(data: bytes) -> bool:
    """True when the OLE2 container holds an encrypted-OOXML package."""
    try:
        streams = ole_streams(data)
    except Exception:
        return False
    return "EncryptionInfo" in streams and "EncryptedPackage" in streams


def decrypt_ooxml(data: bytes, password: str) -> bytes:
    """Encrypted-OOXML container bytes → plain ``.xlsx`` zip bytes.

    Dispatches on the EncryptionInfo version; raises
    :class:`WrongPasswordError` when the password verifier fails and
    ``NotImplementedError`` for schemes outside Standard/Agile
    (extensible encryption, which nothing mainstream writes).
    """
    streams = ole_streams(data)
    info, pkg = streams["EncryptionInfo"], streams["EncryptedPackage"]
    vmaj, vmin = struct.unpack_from("<HH", info, 0)
    if (vmaj, vmin) == (4, 4):
        return _decrypt_agile(info, pkg, password)
    if vmin == 2 and vmaj in (2, 3, 4):
        return _decrypt_standard(info, pkg, password)
    raise NotImplementedError(
        f"unsupported OOXML encryption version {vmaj}.{vmin}"
    )


# ---------------------------------------------------------------------------
# Agile encryption (MS-OFFCRYPTO 2.3.4.10-15)
# ---------------------------------------------------------------------------


def _iterated_hash(hashfn, salt: bytes, password: str, spin: int) -> bytes:
    h = hashfn(salt + password.encode("utf-16-le")).digest()
    for i in range(spin):
        h = hashfn(struct.pack("<I", i) + h).digest()
    return h


def _agile_key(hashfn, pwd_hash: bytes, block_key: bytes, nbytes: int) -> bytes:
    key = hashfn(pwd_hash + block_key).digest()
    if len(key) < nbytes:  # pad per spec (never hit with SHA-512)
        key += b"\x36" * (nbytes - len(key))
    return key[:nbytes]


def _decrypt_agile(info: bytes, pkg: bytes, password: str) -> bytes:
    root = ET.fromstring(info[8:].decode("utf-8"))
    key_data = root.find(f"{_ENC_NS}keyData")
    enc_key = root.find(
        f"{_ENC_NS}keyEncryptors/{_ENC_NS}keyEncryptor/{_PWD_NS}encryptedKey"
    )
    if key_data is None or enc_key is None:
        raise NotImplementedError("agile container without a password keyEncryptor")
    import base64

    b64 = base64.b64decode
    ek_salt = b64(enc_key.get("saltValue"))
    ek_hash = _HASHES[enc_key.get("hashAlgorithm", "SHA512").upper()]
    ek_bits = int(enc_key.get("keyBits"))
    ek_block = int(enc_key.get("blockSize", "16"))
    spin = int(enc_key.get("spinCount", "100000"))
    pwd_hash = _iterated_hash(ek_hash, ek_salt, password, spin)

    def ek_decrypt(block_key: bytes, payload: bytes) -> bytes:
        key = _agile_key(ek_hash, pwd_hash, block_key, ek_bits // 8)
        iv = ek_salt.ljust(ek_block, b"\x00")[:ek_block]
        return _aes_cbc_decrypt(key, iv, payload)

    # password verifier: Hash(decrypted input) must equal decrypted value
    v_input = ek_decrypt(
        _BLK_VERIFIER_INPUT, b64(enc_key.get("encryptedVerifierHashInput"))
    )[: int(enc_key.get("saltSize", "16"))]
    v_value = ek_decrypt(
        _BLK_VERIFIER_VALUE, b64(enc_key.get("encryptedVerifierHashValue"))
    )
    expect = ek_hash(v_input).digest()
    if v_value[: len(expect)] != expect:
        raise WrongPasswordError("workbookPassword failed the agile verifier")

    secret = ek_decrypt(_BLK_KEY_VALUE, b64(enc_key.get("encryptedKeyValue")))[
        : int(key_data.get("keyBits")) // 8
    ]

    kd_salt = b64(key_data.get("saltValue"))
    kd_hash = _HASHES[key_data.get("hashAlgorithm", "SHA512").upper()]
    kd_block = int(key_data.get("blockSize", "16"))
    total = struct.unpack_from("<Q", pkg, 0)[0]
    out = bytearray()
    seg_size = 4096
    body = pkg[8:]
    for seg, off in enumerate(range(0, len(body), seg_size)):
        iv = kd_hash(kd_salt + struct.pack("<I", seg)).digest()[:kd_block]
        chunk = body[off : off + seg_size]
        if len(chunk) % 16:  # stream may carry unaligned tail padding
            chunk = chunk[: len(chunk) - len(chunk) % 16]
        out += _aes_cbc_decrypt(secret, iv, chunk)
    return bytes(out[:total])


# ---------------------------------------------------------------------------
# Legacy BIFF8 record-level RC4 (MS-OFFCRYPTO 2.3.5 / 2.3.6, MS-XLS 2.2.10)
# ---------------------------------------------------------------------------

# Records whose bodies stay PLAINTEXT in an encrypted BIFF stream (they
# still consume keystream positions): BOF, FILEPASS, UsrExcl, FileLock,
# InterfaceHdr, RRDInfo, RRDHeadMbs.
_BIFF_PLAINTEXT_RECORDS = {0x0809, 0x002F, 0x0194, 0x0195, 0x00E1, 0x0196, 0x0138}
_R_BOUNDSHEET = 0x0085


def biff_is_encrypted(stream: bytes) -> bool:
    """True when the Workbook stream carries a FILEPASS record."""
    return _find_filepass(stream) is not None


def _find_filepass(stream: bytes) -> bytes | None:
    """FILEPASS body, scanning the workbook-globals record walk (it sits
    directly after BOF when present)."""
    off = 0
    while off + 4 <= len(stream):
        rid, ln = struct.unpack_from("<HH", stream, off)
        if rid == 0x002F:
            return stream[off + 4 : off + 4 + ln]
        if rid == 0x000A:  # EOF of the globals substream — not encrypted
            return None
        off += 4 + ln
    return None


def decrypt_biff_stream(stream: bytes, password: str) -> bytes:
    """Decrypt an RC4-encrypted BIFF8 ``Workbook`` stream in place.

    Handles both RC4 variants of FILEPASS ``wEncryptionType=1``:
    CryptoAPI (vMajor 2/3/4 — SHA-1 block keys, the modern writer
    default) and the older standard RC4 (vMajor 1 — MD5 block keys).
    XOR obfuscation (``wEncryptionType=0``) is refused. The cipher
    re-keys every 1024 stream bytes; record Type/Size fields, the
    exempt records, and BoundSheet8's stream-position field stay
    plaintext but still consume keystream, per MS-XLS 2.2.10.
    """
    body = _find_filepass(stream)
    if body is None:
        return stream
    wtype = struct.unpack_from("<H", body, 0)[0]
    if wtype != 1:
        raise NotImplementedError("XOR-obfuscated .xls workbooks are unsupported")
    vmaj = struct.unpack_from("<H", body, 2)[0]
    if vmaj == 1:
        key_of_block, verify = _biff_rc4_standard(body, password)
    else:
        key_of_block, verify = _biff_rc4_cryptoapi(body, password)
    if not verify():
        raise WrongPasswordError("workbookPassword failed the FILEPASS verifier")

    # plaintext mask from a record walk (headers + exempt bodies)
    enc = bytearray(len(stream))
    off = 0
    while off + 4 <= len(stream):
        rid, ln = struct.unpack_from("<HH", stream, off)
        b0 = off + 4
        if rid not in _BIFF_PLAINTEXT_RECORDS:
            for p in range(b0, min(b0 + ln, len(stream))):
                enc[p] = 1
            if rid == _R_BOUNDSHEET:  # lbPlyPos must remain readable
                for p in range(b0, min(b0 + 4, len(stream))):
                    enc[p] = 0
        off = b0 + ln
    out = bytearray(stream)
    ks = None
    for pos in range(len(stream)):
        if pos % 1024 == 0:
            ks = _rc4_keystream(key_of_block(pos // 1024))
        kb = next(ks)
        if enc[pos]:
            out[pos] ^= kb
    return bytes(out)


def _biff_rc4_cryptoapi(body: bytes, password: str):
    """RC4 CryptoAPI: SHA-1 key derivation (MS-OFFCRYPTO 2.3.5.2)."""
    hdr_size = struct.unpack_from("<I", body, 10)[0]
    hdr = body[14 : 14 + hdr_size]
    alg_id, _alg_hash, key_bits = struct.unpack_from("<III", hdr, 8)
    if alg_id != 0x6801:
        raise NotImplementedError(f"FILEPASS CryptoAPI AlgID {alg_id:#x}")
    ver = body[14 + hdr_size :]
    salt_size = struct.unpack_from("<I", ver, 0)[0]
    salt = ver[4 : 4 + salt_size]
    enc_verifier = ver[4 + salt_size : 20 + salt_size]
    enc_vhash = ver[24 + salt_size : 44 + salt_size]
    h0 = hashlib.sha1(salt + password.encode("utf-16-le")).digest()
    nbytes = (key_bits // 8) or 5

    def key_of_block(b: int) -> bytes:
        k = hashlib.sha1(h0 + struct.pack("<I", b)).digest()[:nbytes]
        return k + b"\x00" * 11 if nbytes == 5 else k  # 40-bit zero-pad

    def verify() -> bool:
        ks = _rc4_keystream(key_of_block(0))
        dec = bytes(c ^ next(ks) for c in enc_verifier + enc_vhash)
        return hashlib.sha1(dec[:16]).digest() == dec[16:36]

    return key_of_block, verify


def _biff_rc4_standard(body: bytes, password: str):
    """Older standard RC4: MD5 key derivation (MS-OFFCRYPTO 2.3.6.2)."""
    salt = body[6:22]
    enc_verifier = body[22:38]
    enc_vhash = body[38:54]
    trunc = hashlib.md5(password.encode("utf-16-le")).digest()[:5]
    base = hashlib.md5((trunc + salt) * 16).digest()[:5]

    def key_of_block(b: int) -> bytes:
        return hashlib.md5(base + struct.pack("<I", b)).digest()

    def verify() -> bool:
        ks = _rc4_keystream(key_of_block(0))
        dec = bytes(c ^ next(ks) for c in enc_verifier + enc_vhash)
        return hashlib.md5(dec[:16]).digest() == dec[16:32]

    return key_of_block, verify


# ---------------------------------------------------------------------------
# Standard encryption (MS-OFFCRYPTO 2.3.4.5-9)
# ---------------------------------------------------------------------------


def _decrypt_standard(info: bytes, pkg: bytes, password: str) -> bytes:
    hdr_size = struct.unpack_from("<I", info, 8)[0]
    hdr = info[12 : 12 + hdr_size]
    alg_id, _alg_hash, key_size = struct.unpack_from("<III", hdr, 8)
    if alg_id not in (0x660E, 0x660F, 0x6610):  # AES-128/192/256
        raise NotImplementedError(f"standard encryption AlgID {alg_id:#x}")
    ver = info[12 + hdr_size :]
    salt_size = struct.unpack_from("<I", ver, 0)[0]
    salt = ver[4 : 4 + salt_size]
    enc_verifier = ver[4 + salt_size : 20 + salt_size]
    vh_size = struct.unpack_from("<I", ver, 20 + salt_size)[0]
    enc_verifier_hash = ver[24 + salt_size : 24 + salt_size + 32]

    # 50000-round SHA-1 + ipad/opad expansion (MS-OFFCRYPTO 2.3.4.7)
    h = hashlib.sha1(salt + password.encode("utf-16-le")).digest()
    for i in range(50000):
        h = hashlib.sha1(struct.pack("<I", i) + h).digest()
    h = hashlib.sha1(h + b"\x00\x00\x00\x00").digest()
    x1 = hashlib.sha1(bytes(0x36 ^ b for b in h.ljust(64, b"\x00"))).digest()
    x2 = hashlib.sha1(bytes(0x5C ^ b for b in h.ljust(64, b"\x00"))).digest()
    key = (x1 + x2)[: key_size // 8]

    verifier = _aes_ecb_decrypt(key, enc_verifier)
    verifier_hash = _aes_ecb_decrypt(key, enc_verifier_hash)[:vh_size]
    if hashlib.sha1(verifier).digest()[:vh_size] != verifier_hash:
        raise WrongPasswordError("workbookPassword failed the standard verifier")

    total = struct.unpack_from("<Q", pkg, 0)[0]
    body = pkg[8:]
    if len(body) % 16:
        body = body[: len(body) - len(body) % 16]
    return _aes_ecb_decrypt(key, body)[:total]
