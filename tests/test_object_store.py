"""Object-store (S3/R2) media backend: config validation, URL shapes,
per-request credential merge, and the distributed upload sink driven through
it — reference semantics per app/storage/cloudflare_r2.py + app/main.py:373-400,
no network (FakeS3Client implements the same put/head/delete surface)."""

from __future__ import annotations

import os

import pytest

from docling_service_spark.corpus import corpus_df
from docling_service_spark.hashing import media_key
from docling_service_spark.sparkio.media_sink import upload_media
from docling_service_spark.storage import (
    FakeS3Client,
    LocalMediaStore,
    NullMediaStore,
    ObjectStoreMediaStore,
    make_remote_store,
    merge_storage_config,
    storage_status,
)

CFG = {
    "enabled": True,
    "account_id": "acct123",
    "access_key_id": "AK",
    "secret_access_key": "SK",
    "bucket_name": "media",
}


def test_put_exists_url_roundtrip():
    store = ObjectStoreMediaStore(CFG, client=FakeS3Client())
    assert store.is_enabled()
    key = "images/deadbeefdeadbeef.png"
    assert not store.exists(key)
    url = store.put_bytes(key, b"payload")
    assert url == f"https://media.acct123.r2.cloudflarestorage.com/{key}"
    assert store.exists(key)
    # CDN override wins over the bucket URL (cloudflare_r2.py:149-164).
    cdn = ObjectStoreMediaStore({**CFG, "public_url_base": "https://cdn.example.com/"},
                                client=FakeS3Client())
    assert cdn.url_for(key) == f"https://cdn.example.com/{key}"


def test_incomplete_config_degrades_to_disabled():
    store = ObjectStoreMediaStore({**CFG, "secret_access_key": None}, client=FakeS3Client())
    assert not store.is_enabled()
    assert not store.exists("k")
    with pytest.raises(RuntimeError):
        store.put_bytes("k", b"x")


def test_credential_merge_per_request():
    defaults = {**CFG, "region": "weur", "public_url_base": "https://cdn.default"}
    merged = merge_storage_config({"bucket_name": "override"}, defaults)
    assert merged["bucket_name"] == "override"
    assert merged["account_id"] == "acct123"        # fell back to default
    assert merged["region"] == "weur"
    assert merged["public_url_base"] == "https://cdn.default"
    assert merge_storage_config(None, {})["region"] == "auto"


def test_make_remote_store_selection(tmp_path):
    assert isinstance(make_remote_store({"enabled": False}, CFG), NullMediaStore)
    assert isinstance(
        make_remote_store({"enabled": False}, CFG, local_base=str(tmp_path)), LocalMediaStore
    )
    s = make_remote_store({"public_url_base": "https://cdn.x"}, CFG, client=FakeS3Client())
    assert isinstance(s, ObjectStoreMediaStore) and s.is_enabled()
    status = storage_status(s)
    assert status["cloud_enabled"] and status["bucket"] == "media"
    assert status["public_url_base"] == "https://cdn.x"


def test_upload_media_through_object_store(spark, tmp_path):
    root = str(tmp_path / "s3")
    corpus = corpus_df(spark, 30, partitions=2)

    def factory():
        return ObjectStoreMediaStore(CFG, client=FakeS3Client(root=root))

    n = upload_media(corpus, None, store_factory=factory)
    assert n > 0
    bucket_dir = os.path.join(root, "media", "images")
    uploaded = os.listdir(bucket_dir)
    assert len(uploaded) == n
    # Keys are the engine's content-hash shape; re-upload is a dedup no-op.
    probe = FakeS3Client(root=root)
    sample = uploaded[0]
    head = probe.head_object(Bucket="media", Key=f"images/{sample}")
    assert head["ContentLength"] > 0
    assert upload_media(corpus, None, store_factory=factory) == n
    assert sorted(os.listdir(bucket_dir)) == sorted(uploaded)


def test_media_key_matches_store_layout():
    payload = b"img-123"
    key = media_key(payload)
    assert key.startswith("images/") and key.endswith(".png")
    store = ObjectStoreMediaStore(CFG, client=FakeS3Client())
    url = store.put_bytes(key, payload)
    assert url.endswith(key)
