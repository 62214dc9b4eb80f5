"""X1/X2/F1/F3 unit tests + Python↔Spark parity on the same inputs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from axora_spark.config import CrawlConfig, DEFAULT_URL_FILTERS
from axora_spark.functions import urlnorm
from axora_spark.oracle import passes_filters
from axora_spark.operators.filters import (low_value_skip_filter,
                                           skip_norm_path_col,
                                           url_allow_filter)
from axora_spark.operators.urls import canonicalize_udf


def test_canonicalize_basics():
    c = urlnorm.canonicalize
    assert c("HTTPS://Example.COM:443/a#frag") == "https://example.com/a"
    assert c("https://example.com") == "https://example.com/"
    assert c("https://example.com:8443/x") == "https://example.com:8443/x"
    assert c("https://e.com/p?b=2&a=1") == "https://e.com/p?a=1&b=2"
    assert c("https://e.com/p?") == "https://e.com/p"
    assert c("") == ""
    assert c("not a url") == ""
    assert c("relative/path") == ""


def test_absolutize():
    a = urlnorm.absolutize
    assert a("https://h.com/dir/page", "/x") == "https://h.com/x"
    assert a("https://h.com/dir/page", "x") == "https://h.com/dir/x"
    assert a("https://h.com/dir/", "https://o.com/y") == "https://o.com/y"
    assert a("https://h.com/", "") == ""


def test_skip_norm_path():
    assert urlnorm.skip_norm_path("https://h.com/About_Us/x.HTML") == "/about-us/x-html"


def test_skip_newline_quirk():
    """'subscribe' alone must NOT skip (reference dom_handler.go:40-41 quirk),
    while 'register' must."""
    cfg = CrawlConfig(seeds=(), allowed_domains=())
    assert passes_filters("https://h.com/subscribe", cfg)
    assert not passes_filters("https://h.com/register", cfg)
    assert not passes_filters("https://h.com/site_TAG_page", cfg)  # _→- then 'tag'
    assert not passes_filters("https://h.com/About.html", cfg)


def test_url_filters_any_match():
    cfg = CrawlConfig(seeds=(), allowed_domains=())
    assert passes_filters("https://anything.com/x", cfg)
    assert not passes_filters("http://anything.com/x", cfg)  # F1: https only
    assert not passes_filters("ftp://anything.com/x", cfg)


@pytest.fixture(scope="module")
def url_battery():
    return [
        "https://Example.com/Page/1",
        "https://h.org/about_us",
        "https://h.org/subscribe",
        "https://h.org/x/contact/y",
        "https://h.org/deep/Tag.html",
        "http://insecure.org/a",
        "https://h.org/ok?b=2&a=1#f",
        "https://h.org:443/ok",
        "https://h.org:8443/ok",
        "https://libgen.li/index.php?req=foo",
        "https://libgen.li/index.php?req=foo&x=1",
    ]


def test_spark_python_parity_canonicalize(spark, url_battery):
    df = spark.createDataFrame([(u,) for u in url_battery], "url string")
    got = [r[0] for r in df.select(canonicalize_udf("url")).collect()]
    want = [urlnorm.canonicalize(u) for u in url_battery]
    assert got == want


def test_spark_python_parity_skip_path(spark, url_battery):
    canon = [urlnorm.canonicalize(u) for u in url_battery if urlnorm.canonicalize(u)]
    df = spark.createDataFrame([(u,) for u in canon], "url string")
    got = [r[0] for r in df.select(skip_norm_path_col(F.col("url"))).collect()]
    want = [urlnorm.skip_norm_path(u) for u in canon]
    assert got == want


def test_spark_python_parity_filters(spark, url_battery):
    """Engine F1∧F3 columns agree with oracle passes_filters (no whitelist)."""
    cfg = CrawlConfig(seeds=(), allowed_domains=())
    canon = [urlnorm.canonicalize(u) for u in url_battery if urlnorm.canonicalize(u)]
    df = spark.createDataFrame([(u,) for u in canon], "url string")
    got = {
        r["url"]: r["keep"]
        for r in df.select(
            "url",
            (url_allow_filter(F.col("url"), cfg.url_filters)
             & low_value_skip_filter(F.col("url"))).alias("keep")).collect()
    }
    for u in canon:
        assert got[u] == passes_filters(u, cfg), u
