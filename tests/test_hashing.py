"""XXH64 correctness: published vectors + parity with Spark's builtin."""

from docling_service_spark.hashing import media_key, xxh64, xxh64_hexdigest


def test_published_vectors():
    # Vectors from the public xxHash spec / python-xxhash docs.
    assert xxh64_hexdigest(b"") == "ef46db3751d8e999"
    assert xxh64_hexdigest(b"Nobody inspects the spammish repetition") == "fbcea83c8a378bf1"
    assert xxh64(b"xxhash", 20141025) == 0xB559B98D844E0635


def test_all_length_branches():
    # Exercise <32, 8-byte, 4-byte and tail paths.
    for n in [0, 1, 3, 4, 7, 8, 15, 31, 32, 33, 63, 64, 100]:
        d = bytes(range(256))[: n % 256] * (n // 256 + 1)
        d = d[:n]
        h = xxh64_hexdigest(d)
        assert len(h) == 16
        assert h == xxh64_hexdigest(d)  # deterministic


def test_media_key_shape():
    # Key shape per reference app/main.py:718 / r2_migrate_xxhash.py:107-113.
    k = media_key(b"some image bytes")
    assert k.startswith("images/") and k.endswith(".png")
    assert len(k) == len("images/") + 16 + len(".png")
    int(k[7:23], 16)  # 16 hex chars


def test_spark_builtin_parity(spark):
    """Our XXH64(seed=42) must equal Spark's xxhash64 on binary input —
    evidence the implementation is the standard algorithm."""
    from pyspark.sql import functions as F

    payloads = [b"", b"a", b"hello world", bytes(range(200))]
    df = spark.createDataFrame([(bytearray(p),) for p in payloads], "b binary")
    got = [r[0] for r in df.select(F.xxhash64("b")).collect()]
    M = 1 << 64
    expected = [v - M if v >= (1 << 63) else v for v in (xxh64(p, 42) for p in payloads)]
    assert got == expected


def test_spark_long_parity_vectorized(spark):
    """xxh64_long_spark_np (the kernel's vectorized bucket-fingerprint hash)
    must equal Spark's xxhash64 on a BIGINT column — both against Spark
    itself and against the byte-wise spec impl on the 8 LE bytes."""
    import struct

    import numpy as np
    from pyspark.sql import functions as F

    from docling_service_spark.hashing import xxh64_long_spark_np

    vals = [0, 1, -1, 42, 2**63 - 1, -(2**63), 0x0123456789ABCDEF,
            -0x0123456789ABCDEF]
    got = xxh64_long_spark_np(np.array(vals, dtype=np.int64)).tolist()
    df = spark.createDataFrame([(v,) for v in vals], "v bigint")
    spark_got = [r[0] for r in df.select(F.xxhash64("v")).collect()]
    assert got == spark_got
    M = 1 << 64
    spec = [xxh64(struct.pack("<Q", v & (M - 1)), 42) for v in vals]
    assert got == [v - M if v >= (1 << 63) else v for v in spec]


def test_c_wheel_parity_when_available():
    # At deployment the C xxhash wheel takes over the hot path; digests must
    # be byte-identical to the pure-Python spec impl.
    from docling_service_spark.hashing import HAVE_C_XXHASH, _pure_hexdigest, xxh64_hexdigest

    payloads = [b"", b"a", b"grid-image-1", bytes(range(256)) * 41]
    for p in payloads:
        assert _pure_hexdigest(p) == format(__import__(
            "docling_service_spark.hashing", fromlist=["xxh64"]).xxh64(p), "016x")
    if HAVE_C_XXHASH:
        for p in payloads:
            assert xxh64_hexdigest(p) == _pure_hexdigest(p)
    else:
        assert xxh64_hexdigest is _pure_hexdigest
