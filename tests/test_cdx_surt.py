"""CDX(J) index source (sources.read_cdx) + SURT keys (weburl.surt_key)."""

from __future__ import annotations

import gzip
import os

from pyspark.sql import functions as F

CDXJ_LINES = [
    'com,example)/path/page 20240301120000 {"url": "https://www.example.com/Path/Page", '
    '"mime": "text/html", "status": "200", "digest": "SHA1AAAA", '
    '"length": "1234", "offset": "567", "filename": "crawl/seg-0.warc.gz"}',
    'org,testsite)/ 20231115080910 {"url": "http://testsite.org/", '
    '"mime": "text/plain", "status": "301", "digest": "SHA1BBBB", '
    '"length": "99", "offset": "0", "filename": "crawl/seg-1.warc.gz"}',
    " CDX N b a m s k r M S V g",  # classic header line: must not parse
    "totally broken line",
]


def test_read_cdx_plain_and_gz(spark, tmp_path):
    from textractssmlprocessor_spark.sources import read_cdx

    plain = tmp_path / "idx.cdxj"
    plain.write_text("\n".join(CDXJ_LINES) + "\n")
    gz = tmp_path / "idx2.cdxj.gz"
    with gzip.open(gz, "wt") as f:
        f.write("\n".join(CDXJ_LINES[:2]) + "\n")

    for path, n_good, n_total in ((str(plain), 2, 4), (str(gz), 2, 2)):
        df = read_cdx(spark, path)
        assert df.count() == n_total
        good = {r["surt"]: r for r in df.filter(F.col("url").isNotNull()).collect()}
        assert len(good) == n_good
        r = good["com,example)/path/page"]
        assert r["url"] == "https://www.example.com/Path/Page"
        assert r["status"] == 200
        assert r["length"] == 1234 and r["offset"] == 567
        assert r["warc_filename"] == "crawl/seg-0.warc.gz"
        assert str(r["warc_ts"]) == "2024-03-01 12:00:00"
    # malformed rows keep NULL fields, never kill the scan
    bad = read_cdx(spark, str(plain)).filter(F.col("url").isNull())
    assert bad.count() == 2


def test_read_cdx_is_python_free(spark, tmp_path):
    from textractssmlprocessor_spark.sources import read_cdx

    p = tmp_path / "idx.cdxj"
    p.write_text(CDXJ_LINES[0] + "\n")
    plan = read_cdx(spark, str(p))._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "Arrow" not in plan


def _surt(spark, url: str) -> str:
    from textractssmlprocessor_spark.operators.weburl import surt_key

    df = spark.createDataFrame([(url,)], "u string")
    return df.select(surt_key(F.col("u")).alias("s")).collect()[0]["s"]


def test_surt_key_basics(spark):
    assert _surt(spark, "https://www.Example.COM/Path/Page") == (
        "com,example,www)/path/page"
    )
    # default port dropped (normalize_url), non-default kept
    assert _surt(spark, "http://example.com:80/a") == "com,example)/a"
    assert _surt(spark, "http://example.com:8080/a") == "com,example:8080)/a"
    # bare host keys as host)/
    assert _surt(spark, "https://sub.example.org") == "org,example,sub)/"
    # fragment stripped, tracking params dropped, query sorted + lowercased
    assert _surt(
        spark, "https://example.com/p?b=2&utm_source=x&A=1#frag"
    ) == "com,example)/p?a=1&b=2"


def test_surt_key_schemeless_passthrough(spark):
    assert _surt(spark, "not a url") == "not a url"
    assert _surt(spark, "relative/path?b=1") == "relative/path?b=1"
