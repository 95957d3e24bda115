"""URL canonicalization tests: tricky-case table, idempotence, and
the dedup consequence (variants collapse to one canonical form)."""

from __future__ import annotations

from crawler_spark.functions.url import normalize_url

CASES = [
    # (raw, canonical)
    ("HTTP://Example.COM/Path", "http://example.com/Path"),
    ("http://example.com:80/a", "http://example.com/a"),
    ("https://example.com:443/a", "https://example.com/a"),
    ("https://example.com:8443/a", "https://example.com:8443/a"),
    ("http://example.com/a#frag", "http://example.com/a"),
    ("http://example.com/a?utm_source=x&q=1", "http://example.com/a?q=1"),
    ("http://example.com/a?q=1&utm_campaign=y", "http://example.com/a?q=1"),
    ("http://example.com/a?utm_source=x", "http://example.com/a"),
    ("http://example.com/a?gclid=z123", "http://example.com/a"),
    ("http://example.com/a?b=2&a=1", "http://example.com/a?b=2&a=1"),  # no reorder
    ("http://example.com/a/", "http://example.com/a"),
    ("http://example.com/", "http://example.com/"),
    ("http://example.com", "http://example.com/"),
    ("http://example.com/A/B?x=1#y", "http://example.com/A/B?x=1"),
    ("ftp://Example.com/x", "ftp://example.com/x"),
    # boundary anchoring: params whose names merely CONTAIN a tracking
    # name, and tracking-looking text inside a path segment, survive
    ("http://example.com/a?xgclid=5", "http://example.com/a?xgclid=5"),
    ("http://example.com/a?myutm_a=1", "http://example.com/a?myutm_a=1"),
    ("http://example.com/utm_source=x/page",
     "http://example.com/utm_source=x/page"),
    ("http://example.com/a?utm_x=1&utm_y=2&q=3", "http://example.com/a?q=3"),
    ("http://example.com/a?q=1&fbclid=abc&r=2",
     "http://example.com/a?q=1&r=2"),
]


def _norm(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "u string")
    return [r.n for r in df.select(normalize_url("u").alias("n")).collect()]


def test_canonical_forms(spark):
    got = _norm(spark, [raw for raw, _ in CASES])
    for (raw, want), g in zip(CASES, got):
        assert g == want, (raw, g, want)


def test_idempotent(spark):
    once = _norm(spark, [raw for raw, _ in CASES])
    twice = _norm(spark, once)
    assert once == twice


def test_variants_collapse_for_dedup(spark):
    variants = [
        "HTTP://Shop.Example.com:80/item/42?utm_source=mail#top",
        "http://shop.example.com/item/42/",
        "http://shop.example.com/item/42?utm_campaign=x&utm_medium=y",
    ]
    assert len(set(_norm(spark, variants))) == 1
