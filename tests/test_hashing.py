"""Pure-Python XXH64 must match Spark's JVM xxhash64 (seed 42) exactly —
the oracle simulator depends on it for seen-set fixtures."""

from datascrapexter_spark.functions.hashing import spark_xxhash64_str, xxh64


def test_xxh64_known_vectors():
    # Public XXH64 test vectors (seed 0)
    assert xxh64(b"", seed=0) == 0xEF46DB3751D8E999
    assert xxh64(b"a", seed=0) == 0xD24EC4F1A98C6E5B
    assert xxh64(b"abc", seed=0) == 0x44BC2CF5AD770999


def test_matches_spark_xxhash64(spark):
    from pyspark.sql import functions as F

    urls = [
        "https://example.com/path?a=1&b=2",
        "http://a.b.co/x",
        "",
        "ünïcode-ürl/ドメイン",
        "x" * 100,  # exercises the 32-byte stripe loop
    ]
    df = spark.createDataFrame([(u,) for u in urls], "s string")
    got = {r["s"]: r["h"] for r in df.select("s", F.xxhash64("s").alias("h")).collect()}
    for u in urls:
        assert got[u] == spark_xxhash64_str(u), u
