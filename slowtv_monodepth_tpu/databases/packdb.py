"""PackDB: single-file packed record store (format + writer + readers).

The storage layer replacing the reference's LMDB databases
(`src/external_libs/databases`, 445 LoC over py-lmdb): one append-only file
with a sorted FNV-1a hash index in the footer. Two readers share the format:

- Native (preferred): `native/libpackdb.so` (C++, mmap + O(log n) binary
  search, zero per-open index build) via ctypes.
- Pure Python fallback: mmap + a dict index built on first access.

Both are read-only and thread/multi-process safe (lazy open per handle, the
property the reference gets from LMDB's lazy env, `database.py:28-47`).

Format spec: see `native/packdb.cpp` header comment.
"""
from __future__ import annotations

import ctypes
import mmap
import pickle
import struct
import subprocess
from pathlib import Path
from typing import Iterator, Optional

from .. import LOGGER

__all__ = ['PackWriter', 'PackReader', 'build_native', 'native_available']

MAGIC = b'SPKD0001'
_ENTRY = struct.Struct('<QQQQQ')  # hash, offset, length, key_off, key_len

_NATIVE_DIR = Path(__file__).parent / 'native'
_NATIVE_LIB = _NATIVE_DIR / 'libpackdb.so'
_lib = None


def _fnv1a(data: bytes) -> int:
    h = 0xCBF29CE484222325
    for b in data:
        h = ((h ^ b) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


def build_native(force: bool = False) -> bool:
    """Compile the native reader with the system toolchain. Returns success."""
    if _NATIVE_LIB.is_file() and not force:
        return True
    try:
        subprocess.run(['make', '-C', str(_NATIVE_DIR)], check=True,
                       capture_output=True)
        return True
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        LOGGER.warning(f'PackDB native build failed ({e}); using the Python reader.')
        return False


def _load_lib():
    global _lib
    if _lib is not None:
        return _lib
    if not _NATIVE_LIB.is_file() and not build_native():
        _lib = False
        return _lib
    try:
        lib = ctypes.CDLL(str(_NATIVE_LIB))
    except OSError as e:
        LOGGER.warning(f'PackDB native load failed ({e}); using the Python reader.')
        _lib = False
        return _lib
    lib.pk_open.restype = ctypes.c_void_p
    lib.pk_open.argtypes = [ctypes.c_char_p]
    lib.pk_len.restype = ctypes.c_uint64
    lib.pk_len.argtypes = [ctypes.c_void_p]
    lib.pk_get.restype = ctypes.c_int
    lib.pk_get.argtypes = [ctypes.c_void_p, ctypes.c_char_p, ctypes.c_uint64,
                           ctypes.POINTER(ctypes.c_uint64), ctypes.POINTER(ctypes.c_uint64)]
    lib.pk_key.restype = ctypes.POINTER(ctypes.c_char)
    lib.pk_key.argtypes = [ctypes.c_void_p, ctypes.c_uint64, ctypes.POINTER(ctypes.c_uint64)]
    lib.pk_data.restype = ctypes.POINTER(ctypes.c_ubyte)
    lib.pk_data.argtypes = [ctypes.c_void_p, ctypes.c_uint64]
    lib.pk_meta.restype = ctypes.POINTER(ctypes.c_ubyte)
    lib.pk_meta.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint64)]
    lib.pk_close.argtypes = [ctypes.c_void_p]
    _lib = lib
    return _lib


def native_available() -> bool:
    return bool(_load_lib())


class PackWriter:
    """Stream records into a pack file; the index is written on close.

    Usage::
        with PackWriter(path, meta={'kind': 'image'}) as w:
            w.put('key', payload_bytes)
    """

    def __init__(self, path, meta: Optional[dict] = None):
        self.path = Path(path)
        self.path.parent.mkdir(parents=True, exist_ok=True)
        self.meta = meta or {}
        self._entries: list = []
        self._f = open(self.path, 'wb')
        self._f.write(MAGIC)
        self._f.write(struct.pack('<Q', 0))  # index_offset placeholder.

    def put(self, key: str, value: bytes) -> None:
        kb = key.encode('utf-8')
        off = self._f.tell()
        self._f.write(value)
        self._entries.append((_fnv1a(kb), off, len(value), kb))

    def close(self) -> None:
        index_offset = self._f.tell()
        # Sort by (hash, key bytes) — the native reader's search order.
        self._entries.sort(key=lambda e: (e[0], e[3]))

        keys_blob = bytearray()
        table = bytearray()
        for h, off, length, kb in self._entries:
            table += _ENTRY.pack(h, off, length, len(keys_blob), len(kb))
            keys_blob += kb

        meta = dict(self.meta)
        meta.setdefault('protocol', pickle.DEFAULT_PROTOCOL)
        meta_blob = pickle.dumps(meta)

        self._f.write(struct.pack('<Q', len(self._entries)))
        self._f.write(table)
        self._f.write(keys_blob)
        self._f.write(struct.pack('<Q', len(meta_blob)))
        self._f.write(meta_blob)

        self._f.seek(8)
        self._f.write(struct.pack('<Q', index_offset))
        self._f.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class PackReader:
    """Read-only pack handle; prefers the native reader, lazy-opens on first
    access (safe to construct before forking/threading workers)."""

    def __init__(self, path, use_native: Optional[bool] = None):
        self.path = str(path)
        self.use_native = native_available() if use_native is None else use_native
        self._h = None          # Native handle.
        self._mm = None         # Python mmap.
        self._index: Optional[dict] = None
        self._meta: Optional[dict] = None
        self._keys: Optional[list] = None

    # ------------------------------------------------------------------ open
    def _open(self):
        if self.use_native:
            if self._h is None:
                lib = _load_lib()
                self._h = lib.pk_open(self.path.encode())
                if not self._h:
                    raise OSError(f'Not a valid pack file: {self.path}')
            return
        if self._mm is None:
            f = open(self.path, 'rb')
            self._mm = mmap.mmap(f.fileno(), 0, access=mmap.ACCESS_READ)
            f.close()
            if self._mm[:8] != MAGIC:
                raise OSError(f'Not a valid pack file: {self.path}')
            (index_offset,) = struct.unpack_from('<Q', self._mm, 8)
            (n,) = struct.unpack_from('<Q', self._mm, index_offset)
            table_off = index_offset + 8
            keys_off = table_off + n * _ENTRY.size
            self._index = {}
            entries = []
            for i in range(n):
                h, off, length, key_off, key_len = _ENTRY.unpack_from(
                    self._mm, table_off + i * _ENTRY.size)
                entries.append((off, length, key_off, key_len))
            keys_end = keys_off
            self._keys_py = []
            for off, length, key_off, key_len in entries:
                key = self._mm[keys_off + key_off:keys_off + key_off + key_len].decode()
                self._index[key] = (off, length)
                self._keys_py.append(key)
                keys_end = max(keys_end, keys_off + key_off + key_len)
            (meta_len,) = struct.unpack_from('<Q', self._mm, keys_end)
            self._meta = pickle.loads(self._mm[keys_end + 8:keys_end + 8 + meta_len])

    # ------------------------------------------------------------------- api
    @property
    def meta(self) -> dict:
        if self._meta is None:
            self._open()
            if self.use_native:
                lib = _load_lib()
                n = ctypes.c_uint64()
                ptr = lib.pk_meta(self._h, ctypes.byref(n))
                self._meta = pickle.loads(ctypes.string_at(ptr, n.value))
        return self._meta

    @property
    def keys(self) -> list:
        if self._keys is None:
            self._open()
            if self.use_native:
                lib = _load_lib()
                out = []
                n = lib.pk_len(self._h)
                klen = ctypes.c_uint64()
                for i in range(n):
                    ptr = lib.pk_key(self._h, i, ctypes.byref(klen))
                    out.append(ctypes.string_at(ptr, klen.value).decode())
                self._keys = out
            else:
                self._keys = list(self._keys_py)
        return self._keys

    def __len__(self) -> int:
        self._open()
        if self.use_native:
            return _load_lib().pk_len(self._h)
        return len(self._index)

    def __contains__(self, key: str) -> bool:
        try:
            self.get(key)
            return True
        except KeyError:
            return False

    def get(self, key: str) -> bytes:
        """Record bytes for `key` (raises KeyError)."""
        self._open()
        if self.use_native:
            lib = _load_lib()
            kb = key.encode('utf-8')
            off, length = ctypes.c_uint64(), ctypes.c_uint64()
            if lib.pk_get(self._h, kb, len(kb), ctypes.byref(off),
                          ctypes.byref(length)) != 0:
                raise KeyError(key)
            ptr = lib.pk_data(self._h, off.value)
            return ctypes.string_at(ptr, length.value)
        try:
            off, length = self._index[key]
        except KeyError:
            raise KeyError(key) from None
        return self._mm[off:off + length]

    def __iter__(self) -> Iterator[str]:
        return iter(self.keys)

    def close(self) -> None:
        if self._h:
            _load_lib().pk_close(self._h)
            self._h = None
        if self._mm:
            self._mm.close()
            self._mm = None
