"""Pluggable media sink (SURVEY.md §2 A19).

The reference's storage ABC (``app/storage/base.py:25-111``) exposes
upload/exists/get_url over local FS or Cloudflare R2.  The engine needs only
three methods; ``media_ref`` strings in the output are computed *without*
touching any sink (pure content-hash keys), so correctness never depends on
storage — the sink is for materializing deduplicated media blobs.

Backends: local FS, null (compute-only), and an S3/R2 object store
(``ObjectStoreMediaStore``) replicating the reference's semantics —
config validation that degrades to disabled (``cloudflare_r2.py:70-82``),
public-URL derivation with CDN override (``cloudflare_r2.py:149-164``), and
per-request credential merge over env defaults (``app/main.py:373-400``).
The S3 wire client is pluggable: boto3 when installed, an in-memory fake
(same put/head/delete surface) in the no-network sandbox.
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


class ObjectStoreKeyMissing(KeyError):
    """head/get on a key the store doesn't hold (the S3 404 analog)."""


class FakeS3Client:
    """S3-compatible client stand-in for boto3 in the no-network sandbox.

    Implements exactly the calls the reference backend makes
    (``cloudflare_r2.py``: put_object :231-238, head_object :193-199,
    delete_object :134-139) so ObjectStoreMediaStore runs identically over
    either client.  In-memory by default; pass ``root`` to back objects with
    files so state is shared across Spark executor processes (the
    foreachPartition upload sink builds one client per task)."""

    def __init__(self, root: Optional[str] = None):
        self.root = root
        self.objects: dict[tuple[str, str], bytes] = {}
        self.content_types: dict[tuple[str, str], str] = {}

    def _fs_path(self, bucket: str, key: str) -> str:
        return os.path.join(self.root, bucket, key.lstrip("/"))

    def put_object(self, *, Bucket: str, Key: str, Body: bytes,
                   ContentType: str = "application/octet-stream") -> None:
        if self.root is not None:
            path = self._fs_path(Bucket, Key)
            os.makedirs(os.path.dirname(path), exist_ok=True)
            tmp = f"{path}.{os.getpid()}.{uuid.uuid4().hex}.tmp"
            with open(tmp, "wb") as f:
                f.write(bytes(Body))
            os.replace(tmp, path)
        else:
            self.objects[(Bucket, Key)] = bytes(Body)
        self.content_types[(Bucket, Key)] = ContentType

    def head_object(self, *, Bucket: str, Key: str) -> dict:
        if self.root is not None:
            path = self._fs_path(Bucket, Key)
            if not os.path.exists(path):
                raise ObjectStoreKeyMissing(f"404: s3://{Bucket}/{Key}")
            return {"ContentLength": os.path.getsize(path)}
        if (Bucket, Key) not in self.objects:
            raise ObjectStoreKeyMissing(f"404: s3://{Bucket}/{Key}")
        return {"ContentLength": len(self.objects[(Bucket, Key)])}

    def delete_object(self, *, Bucket: str, Key: str) -> None:
        if self.root is not None:
            try:
                os.remove(self._fs_path(Bucket, Key))
            except FileNotFoundError:
                pass
        else:
            self.objects.pop((Bucket, Key), None)
        self.content_types.pop((Bucket, Key), None)


_REQUIRED_FIELDS = ("account_id", "access_key_id", "secret_access_key", "bucket_name")


class ObjectStoreMediaStore:
    """S3/R2 media sink (reference ``app/storage/cloudflare_r2.py``).

    Config keys mirror the reference: enabled, account_id, access_key_id,
    secret_access_key, bucket_name, region, public_url_base.  Incomplete
    config degrades to disabled rather than raising (``cloudflare_r2.py:
    70-82``); puts against a disabled store raise RuntimeError
    (``cloudflare_r2.py:220-222``)."""

    def __init__(self, config: dict, client=None):
        self.account_id = config.get("account_id")
        self.access_key_id = config.get("access_key_id")
        self.secret_access_key = config.get("secret_access_key")
        self.bucket_name = config.get("bucket_name")
        self.region = config.get("region", "auto")
        self.public_url_base = config.get("public_url_base")
        self.enabled = bool(config.get("enabled", False)) and all(
            getattr(self, f) for f in _REQUIRED_FIELDS
        )
        self.client = client if client is not None else (self._boto3_client() if self.enabled else None)
        if self.client is None:
            self.enabled = False

    def _boto3_client(self):
        try:
            import boto3
        except ImportError:
            return None
        return boto3.client(
            service_name="s3",
            endpoint_url=f"https://{self.account_id}.r2.cloudflarestorage.com",
            aws_access_key_id=self.access_key_id,
            aws_secret_access_key=self.secret_access_key,
            region_name=self.region,
        )

    def is_enabled(self) -> bool:
        return self.enabled and self.client is not None

    def put_bytes(self, key: str, payload: bytes) -> str:
        if not self.is_enabled():
            raise RuntimeError("object storage not enabled or configured")
        content_type = "image/png" if key.endswith(".png") else "application/octet-stream"
        self.client.put_object(Bucket=self.bucket_name, Key=key, Body=payload,
                               ContentType=content_type)
        return self.url_for(key)

    def exists(self, key: str) -> bool:
        if not self.is_enabled():
            return False
        try:
            self.client.head_object(Bucket=self.bucket_name, Key=key)
            return True
        except Exception:
            return False  # 404 and transient errors both report absent (ref :200-208)

    def url_for(self, key: str) -> str:
        """CDN base when configured, else the R2 public bucket URL
        (``cloudflare_r2.py:149-164``)."""
        if self.public_url_base:
            return f"{self.public_url_base.rstrip('/')}/{key}"
        return f"https://{self.bucket_name}.{self.account_id}.r2.cloudflarestorage.com/{key}"


def merge_storage_config(custom: Optional[dict], defaults: Optional[dict] = None) -> dict:
    """Per-request credential merge (reference ``app/main.py:373-400``): each
    custom field falls back to the deployment default, so a request can
    override just the bucket or just the CDN base."""
    defaults = defaults or {}
    custom = custom or {}
    merged = {"enabled": custom.get("enabled", defaults.get("enabled", True))}
    for field in (*_REQUIRED_FIELDS, "region", "public_url_base"):
        merged[field] = custom.get(field) or defaults.get(field)
    merged["region"] = merged["region"] or "auto"
    return merged


def make_remote_store(custom: Optional[dict], defaults: Optional[dict] = None,
                      *, client=None, local_base: Optional[str] = None) -> MediaStore:
    """Request-scoped backend selection (reference ``app/main.py:373-400``):
    disabled → local (or null), else object store over the merged config."""
    merged = merge_storage_config(custom, defaults)
    if not merged["enabled"]:
        return make_store(local_base)
    return ObjectStoreMediaStore(merged, client=client)


def make_store(base_path: Optional[str]) -> MediaStore:
    return LocalMediaStore(base_path) if base_path else NullMediaStore()


def storage_status(store: MediaStore) -> dict:
    """Config introspection (reference ``GET /api/cloud-storage/status``,
    app/main.py:1357-1377): which backend is active and where it points."""
    kind = type(store).__name__
    cloud = isinstance(store, ObjectStoreMediaStore)
    return {
        "backend": kind,
        "cloud_enabled": cloud and store.is_enabled(),
        "materializes": kind != "NullMediaStore" and (not cloud or store.is_enabled()),
        "base_path": getattr(store, "base_path", None),
        "bucket": getattr(store, "bucket_name", None),
        "public_url_base": getattr(store, "public_url_base", None),
    }
