"""URL canonicalization unit pins (operators/urlnorm.py, r13) — the
edge cases the driver-oracle query (url_canonical_dedup_check) does
not synthesize: component isolation (the r13 code-review findings:
dot-segments must not rewrite QUERY values, tracking-param stripping
must not truncate a PATH containing a literal '&utm_...=', userinfo
keeps its case, IPv6/userinfo can't hide a default port), deeper
dot-segment nesting vs the rounds bound, idempotence, and the
documented non-goals staying untouched."""

from __future__ import annotations

from pyspark.sql import functions as F

from stripe_data_pipeline_spark.operators.urlnorm import canonicalize_url


def _canon(spark, urls, rounds=4):
    df = spark.createDataFrame([(u,) for u in urls], "raw string")
    return [
        r.c
        for r in df.select(
            canonicalize_url(F.col("raw"), rounds=rounds).alias("c")
        ).collect()
    ]


def test_rules(spark):
    cases = {
        # scheme/host case + default port
        "HTTPS://Shop.Example.COM:443/p/1": "https://shop.example.com/p/1",
        "HTTP://a.example:80/x": "http://a.example/x",
        # NON-default port survives
        "https://a.example:8443/x": "https://a.example:8443/x",
        # path case is PRESERVED (RFC 3986: paths are case-sensitive)
        "https://a.example/Path/X": "https://a.example/Path/X",
        # fragment
        "https://a.example/x#frag?not-a-query": "https://a.example/x",
        # dot segments, including trailing forms
        "https://a.example/a/./b": "https://a.example/a/b",
        "https://a.example/a/../b": "https://a.example/b",
        "https://a.example/a/b/..": "https://a.example/a/",
        "https://a.example/a/.": "https://a.example/a/",
        # nested unwinding within the default rounds bound
        "https://a.example/a/b/c/../../../d": "https://a.example/d",
        # tracking params: leading, middle, trailing, entire query
        "https://a.example/x?utm_source=s&id=1": "https://a.example/x?id=1",
        "https://a.example/x?id=1&utm_medium=m&q=2":
            "https://a.example/x?id=1&q=2",
        "https://a.example/x?id=1&gclid=g": "https://a.example/x?id=1",
        "https://a.example/x?fbclid=f": "https://a.example/x",
        "https://a.example/x?utm_a=1&utm_b=2&msclkid=3":
            "https://a.example/x",
        # non-goals: encoding and param order untouched
        "https://a.example/%41?b=2&a=1": "https://a.example/%41?b=2&a=1",
    }
    got = _canon(spark, list(cases))
    for (raw, want), g in zip(cases.items(), got):
        assert g == want, f"{raw!r}: {g!r} != {want!r}"


def test_component_isolation(spark):
    """The r13 code-review findings: every rule must stay inside its
    RFC 3986 component."""
    cases = {
        # dot segments in QUERY VALUES are data, not path structure
        "https://x.example/r?to=/a/../b": "https://x.example/r?to=/a/../b",
        "https://x.example/r?p=/./x": "https://x.example/r?p=/./x",
        # '&' is a legal PATH sub-delim: a literal '&utm_source=' in
        # the path must survive; the QUERY's tracking param still goes
        "https://x.example/a&utm_source=x/b":
            "https://x.example/a&utm_source=x/b",
        "https://x.example/a&utm_source=x/b?utm_source=y&id=1":
            "https://x.example/a&utm_source=x/b?id=1",
        # userinfo is CASE-SENSITIVE (only scheme+host lowercase)
        "https://User@Host.Example/x": "https://User@host.example/x",
        # default ports behind userinfo / IPv6 literals still drop
        "https://u:p@host.example:443/x": "https://u:p@host.example/x",
        "HTTP://[2001:DB8::1]:80/x": "http://[2001:db8::1]/x",
        "https://[2001:db8::1]:8443/x": "https://[2001:db8::1]:8443/x",
        # dot segments in FINAL position before a query resolve
        "https://x.example/a/..?q=1": "https://x.example/?q=1",
        "https://x.example/a/b/.?q=1": "https://x.example/a/b/?q=1",
        # tracking param whose VALUE contains a path-ish string
        "https://x.example/x?utm_source=/a/../b&id=2":
            "https://x.example/x?id=2",
    }
    got = _canon(spark, list(cases))
    for (raw, want), g in zip(cases.items(), got):
        assert g == want, f"{raw!r}: {g!r} != {want!r}"


def test_idempotent_and_rounds_bound(spark):
    urls = [
        "HTTPS://A.Example:443/a/./b/../c?utm_x=1&id=2#f",
        "https://a.example/" + "d/" * 6 + "../" * 6 + "end",
        "https://u@h.example:8080/p/..?id=/x/../y&utm_a=1",
    ]
    once = _canon(spark, urls, rounds=8)
    twice = _canon(spark, once, rounds=8)
    assert once == twice  # canonical forms are fixed points
    assert once[1] == "https://a.example/end"  # 6 levels within 8 rounds
    assert once[2] == "https://u@h.example:8080/?id=/x/../y"


def test_root_anchored_dot_segments(spark):
    """ADVICE r13 (low): '..' at the path ROOT has no parent — RFC
    3986 remove_dot_segments drops it ('/../a' -> '/a'), including
    runs surfaced by the bounded unwind itself."""
    cases = {
        "https://a.example/../x": "https://a.example/x",
        "https://a.example/./../x": "https://a.example/x",
        "https://a.example/../../x": "https://a.example/x",
        "https://a.example/a/../../x": "https://a.example/x",
        "https://a.example/a/b/../../../x": "https://a.example/x",
        "https://a.example/..": "https://a.example/",
        "https://a.example/../..": "https://a.example/",
        "https://a.example/../x?p=/../q": "https://a.example/x?p=/../q",
        # '..' as a QUERY value is data, not path structure
        "https://a.example/x?up=..": "https://a.example/x?up=..",
    }
    got = _canon(spark, list(cases))
    for (raw, want), g in zip(cases.items(), got):
        assert g == want, f"{raw!r}: {g!r} != {want!r}"
    assert _canon(spark, got) == got  # still a fixed point
