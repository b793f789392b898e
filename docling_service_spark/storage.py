"""Pluggable media sink (SURVEY.md §2 A19).

The reference's storage ABC (``app/storage/base.py:25-111``) exposes
upload/exists/get_url over local FS or Cloudflare R2.  The engine needs only
three methods; ``media_ref`` strings in the output are computed *without*
touching any sink (pure content-hash keys), so correctness never depends on
storage — the sink is for materializing deduplicated media blobs.

Only a local-FS implementation exists in-sandbox; an S3/R2 implementation is
the same three methods over boto3 (per-request credential merge and URL
shapes per ``app/storage/cloudflare_r2.py``).
"""

from __future__ import annotations

import os
import uuid
from typing import Optional, Protocol


class MediaStore(Protocol):
    def put_bytes(self, key: str, payload: bytes) -> str:
        """Store payload under key; returns the public ref/url."""
        ...

    def exists(self, key: str) -> bool: ...

    def url_for(self, key: str) -> str: ...


class LocalMediaStore:
    """Key→file store under a base path (reference ``app/storage/local.py``)."""

    def __init__(self, base_path: str):
        self.base_path = base_path
        os.makedirs(base_path, exist_ok=True)

    def _path(self, key: str) -> str:
        safe = key.lstrip("/")
        return os.path.join(self.base_path, safe)

    def put_bytes(self, key: str, payload: bytes) -> str:
        path = self._path(key)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        # Unique tmp per writer: concurrent jobs uploading the same
        # content-addressed key must not share a tmp path (a fixed name lets
        # writer A os.replace a half-written file and writer B's os.replace
        # then raise FileNotFoundError, failing the Spark task).  Identical
        # bytes, last rename wins, both succeed.
        tmp = f"{path}.{os.getpid()}.{uuid.uuid4().hex}.tmp"
        with open(tmp, "wb") as f:
            f.write(payload)
        os.replace(tmp, path)
        return key

    def exists(self, key: str) -> bool:
        return os.path.exists(self._path(key))

    def url_for(self, key: str) -> str:
        return self._path(key)


class NullMediaStore:
    """Compute-only mode: refs are emitted, nothing is materialized."""

    def put_bytes(self, key: str, payload: bytes) -> str:
        return key

    def exists(self, key: str) -> bool:
        return False

    def url_for(self, key: str) -> str:
        return key


def make_store(base_path: Optional[str]) -> MediaStore:
    return LocalMediaStore(base_path) if base_path else NullMediaStore()


def storage_status(store: MediaStore) -> dict:
    """Config introspection (reference ``GET /api/cloud-storage/status``,
    app/main.py:1357-1377): which backend is active and where it points."""
    kind = type(store).__name__
    return {
        "backend": kind,
        "cloud_enabled": kind not in ("LocalMediaStore", "NullMediaStore"),
        "materializes": kind != "NullMediaStore",
        "base_path": getattr(store, "base_path", None),
    }
