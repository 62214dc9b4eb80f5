"""S8 — public-IP probe semantics vs crawler/ip_checker.go:10-35."""

from __future__ import annotations

from axora_spark.sources.ipprobe import (IPIFY_URL, get_public_ip,
                                         probe_executors)


def _fixed(status: int, body: str | None):
    calls = []

    def _tp(url: str):
        calls.append(url)
        return status, body
    _tp.calls = calls
    return _tp


def test_ok_trims_body():
    tp = _fixed(200, "  203.0.113.7\n")
    assert get_public_ip(tp) == "203.0.113.7"
    assert tp.calls == [IPIFY_URL]  # default endpoint (ip_checker.go:11)


def test_non_200_is_empty_not_error():
    # ip_checker.go:24-26: StatusCode != 200 → ("", nil)
    assert get_public_ip(_fixed(503, "Service Unavailable")) == ""


def test_transport_error_is_empty():
    # S3 transport contract maps exceptions to status 0
    assert get_public_ip(_fixed(0, None)) == ""


def test_probe_executors_distinct(spark):
    tp = _fixed(200, "198.51.100.9")
    out = probe_executors(spark, transport=tp, slots=4).collect()
    # local mode: one host, one egress IP, however many tasks probed
    assert len(out) == 1
    assert out[0].egress_ip == "198.51.100.9"
    assert out[0].executor_host


def test_probe_executors_error_rows(spark):
    out = probe_executors(spark, transport=_fixed(500, None),
                          slots=2).collect()
    assert len(out) == 1 and out[0].egress_ip == ""
