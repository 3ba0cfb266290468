"""Archive container: a tar of named stream members plus a JSON manifest.

Reference analog: the reference shells out to `tar -cf` over its temp dir
(src/spring.cpp:250-255) with a raw-struct `cp.bin` manifest
(src/spring.cpp:217-221). We keep the tar interop (the archive can be
inspected with standard tools) but write it in-process and use a versioned
JSON manifest (`params.json`) — the raw-struct dump is ABI-fragile and
deliberately not reproduced.

Per-block streams are named `<stream>.<block>` so random-access decompression
(--decompress-range) can extract only the blocks it needs.
"""
from __future__ import annotations

import io
import os
import tarfile
from typing import Iterator, Optional

from ..params import CompressionParams

MANIFEST_NAME = "params.json"


class ArchiveWriter:
    def __init__(self, path: str):
        self._tar = tarfile.open(path, "w", format=tarfile.GNU_FORMAT)
        self._names: set[str] = set()

    def add(self, name: str, data: bytes) -> None:
        if name in self._names:
            raise ValueError(f"duplicate archive member {name}")
        self._names.add(name)
        info = tarfile.TarInfo(name)
        info.size = len(data)
        self._tar.addfile(info, io.BytesIO(data))

    def add_block(self, stream: str, block: int, data: bytes) -> None:
        self.add(f"{stream}.{block}", data)

    def finish(self, params: CompressionParams) -> None:
        self.add(MANIFEST_NAME, params.to_json().encode())
        self._tar.close()

    def __enter__(self):
        return self

    def __exit__(self, exc_type, *exc):
        if exc_type is None:
            return
        self._tar.close()


class ArchiveReader:
    def __init__(self, path: str):
        self._tar = tarfile.open(path, "r")
        self._members = {m.name: m for m in self._tar.getmembers()}
        # member reads use os.pread at the recorded data offset: tarfile's
        # extractfile().read() seeks a SHARED file object and is not
        # thread-safe — the block-parallel decoder read corrupt bytes
        self._fd = os.open(path, os.O_RDONLY)
        raw = self.get(MANIFEST_NAME)
        self.params = CompressionParams.from_json(raw.decode())

    def __contains__(self, name: str) -> bool:
        return name in self._members

    def get(self, name: str) -> bytes:
        m = self._members.get(name)
        if m is None:
            raise KeyError(f"archive member {name} not found")
        return os.pread(self._fd, m.size, m.offset_data)

    def get_block(self, stream: str, block: int) -> bytes:
        return self.get(f"{stream}.{block}")

    def has_block(self, stream: str, block: int) -> bool:
        return f"{stream}.{block}" in self._members

    def names(self) -> Iterator[str]:
        return iter(self._members)

    def size_by_prefix(self) -> dict[str, int]:
        """Compressed bytes per stream family (reference reports stream
        sizes by filename first letter, src/spring.cpp:228-248)."""
        sizes: dict[str, int] = {}
        for name, m in self._members.items():
            key = name.split(".")[0]
            sizes[key] = sizes.get(key, 0) + m.size
        return sizes

    def close(self) -> None:
        self._tar.close()
        if self._fd >= 0:
            os.close(self._fd)
            self._fd = -1

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
