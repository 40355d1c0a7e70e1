"""Pure-Python XXH64 must match Spark's xxhash64 bit-for-bit — the reader
routes term fetches to hive buckets with it (query/reader.py); a mismatch
would silently drop postings."""

from pyspark.sql import functions as F

from tesserae_ng_spark.query.reader import _xxhash64_str


def test_xxhash64_matches_spark(spark):
    # lengths cross every code path: <4, 4-7, 8-31, >=32 bytes; plus
    # non-ASCII multi-byte UTF-8
    samples = [
        "", "a", "ab", "abc", "abcd", "abcde", "abcdefg", "abcdefgh",
        "abcdefghi", "the", "join", "hash", "running", "café",
        "x" * 31, "x" * 32, "x" * 33, "x" * 100,
        "мир", "日本語テスト", "a b c d e f g h i j k l m n o p",
    ] + [f"term{i}" for i in range(50)]
    df = spark.createDataFrame([(s,) for s in samples], "s string")
    want = {
        r["s"]: r["h"]
        for r in df.select("s", F.xxhash64("s").alias("h")).collect()
    }
    for s in samples:
        assert _xxhash64_str(s) == want[s], s
