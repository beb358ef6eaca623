"""Bounded-IO file access for tag parsing.

Tags live at the head (ID3v2, FLAC metadata, MP4 moov, ASF header) and
tail (ID3v1, APEv2, Ogg last-granule) of a file; the audio stream in the
middle — usually >99% of the bytes — is never needed.  ``LazyFileBytes``
exposes a file through the small bytes protocol the parsers use
(``len``, slicing, ``startswith``, ``find``/``rfind``), reading 256 KiB
blocks on demand with a bounded FIFO cache.  Every parser in this
package then runs unchanged against a 50 MB file while touching only a
few hundred KiB — the difference between scanning 100 TB and scanning
1 TB on a full-library ingest.

Atom/chunk walkers benefit automatically: skipping an ``mdat`` or SSND
chunk is a seek, not a read.
"""

from __future__ import annotations

import os
from collections import OrderedDict

_BLOCK = 1 << 18          # 256 KiB read unit
_MAX_CACHE = 64           # ≤16 MiB resident per open file
_MAX_RSCAN = 1 << 21      # rfind gives up after scanning 2 MiB of tail
_MAX_FSCAN = 1 << 21      # find scans at most 2 MiB forward


class LazyFileBytes:
    """Read-only bytes-like view over a file with on-demand block IO.

    Supports exactly the operations the audiotags parsers perform:
    ``len()``, ``bool()``, integer indexing, slicing (negative indexes
    included; slices return real ``bytes``), ``startswith``, bounded
    ``find``/``rfind``.  ``bytes_read`` counts actual IO for tests and
    telemetry.
    """

    def __init__(self, path: str, block: int = _BLOCK,
                 max_cache: int = _MAX_CACHE) -> None:
        self._fh = open(path, "rb")
        self._size = os.fstat(self._fh.fileno()).st_size
        self._block = block
        self._max_cache = max_cache
        self._cache: OrderedDict[int, bytes] = OrderedDict()
        self.bytes_read = 0

    # -- context / cleanup -------------------------------------------------
    def close(self) -> None:
        try:
            self._fh.close()
        except OSError:  # pragma: no cover
            pass

    def __enter__(self) -> "LazyFileBytes":
        return self

    def __exit__(self, *exc) -> None:
        self.close()

    # -- core protocol -----------------------------------------------------
    def __len__(self) -> int:
        return self._size

    def __bool__(self) -> bool:
        return self._size > 0

    def _block_at(self, idx: int) -> bytes:
        blk = self._cache.get(idx)
        if blk is None:
            self._fh.seek(idx * self._block)
            blk = self._fh.read(self._block)
            self.bytes_read += len(blk)
            self._cache[idx] = blk
            if len(self._cache) > self._max_cache:
                self._cache.popitem(last=False)
        else:
            self._cache.move_to_end(idx)
        return blk

    def _read(self, start: int, stop: int) -> bytes:
        start = max(start, 0)
        stop = min(stop, self._size)
        if stop <= start:
            return b""
        first, last = start // self._block, (stop - 1) // self._block
        parts = [self._block_at(i) for i in range(first, last + 1)]
        raw = parts[0] if len(parts) == 1 else b"".join(parts)
        off = start - first * self._block
        return raw[off:off + (stop - start)]

    def __getitem__(self, key):
        if isinstance(key, slice):
            start, stop, step = key.indices(self._size)
            if step != 1:
                return self._read(start, stop)[::step]
            return self._read(start, stop)
        if key < 0:
            key += self._size
        if not 0 <= key < self._size:
            raise IndexError("index out of range")
        return self._read(key, key + 1)[0]

    # -- bytes-compatible helpers -----------------------------------------
    def startswith(self, prefix: bytes, start: int = 0) -> bool:
        return self._read(start, start + len(prefix)) == prefix

    def find(self, sub: bytes, start: int = 0, end: int | None = None,
             ) -> int:
        """Forward search, bounded to ``_MAX_FSCAN`` bytes — parsers use
        this only for resync after corruption, never for bulk scans."""
        end = self._size if end is None else min(end, self._size)
        end = min(end, start + _MAX_FSCAN)
        pos = max(start, 0)
        overlap = len(sub) - 1
        while pos < end:
            chunk_end = min(pos + self._block, end)
            # overlap so boundary-spanning matches are seen, capped at
            # `end` — bytes.find requires the match inside [start, end)
            chunk = self._read(pos, min(chunk_end + overlap, end))
            hit = chunk.find(sub)
            if hit >= 0:
                return pos + hit
            pos = chunk_end
        return -1

    def rfind(self, sub: bytes, start: int = 0, end: int | None = None,
              ) -> int:
        """Backward search from ``end``, bounded to ``_MAX_RSCAN`` bytes
        of tail — enough for any real Ogg page / APE footer."""
        end = self._size if end is None else min(end, self._size)
        low = max(start, end - _MAX_RSCAN)
        pos = end
        overlap = len(sub) - 1
        while pos > low:
            chunk_start = max(pos - self._block, low)
            # overlap upward for boundary-spanning matches, capped at
            # `end` — bytes.rfind requires the match inside [start, end)
            chunk = self._read(chunk_start, min(pos + overlap, end))
            hit = chunk.rfind(sub)
            if hit >= 0:
                found = chunk_start + hit
                if found >= start:
                    return found
            pos = chunk_start
        return -1

    def __contains__(self, sub: bytes) -> bool:
        return self.find(sub) >= 0


def open_for_parse(path: str) -> LazyFileBytes:
    """Open a file as a lazily-read bytes view for ``parse_audio``."""
    return LazyFileBytes(path)
