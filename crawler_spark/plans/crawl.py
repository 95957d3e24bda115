"""Depth-limited BFS crawl (SURVEY.md §2.10 D1-D3, §3.2).

The reference crawls with a Scrapy CrawlSpider: LinkExtractor over
('a','img') restricted to allowed domains, DEPTH_LIMIT waves, request
dupefilter + unique(url) upsert (dynamic_spider.py:13-25,
settings.py:10, models.py:26). Here each wave is one distributed
fetch+parse pass; the frontier and the visited set are DataFrames, so
at cluster scale a wave of billions of urls shuffles/dedups with
ordinary joins rather than a driver-side set. The loop itself is
driver-side — depth is small (reference default 1), so the plan stays
shallow.

robots.txt (P8, settings.py:7): per-domain robots fetched through the
same pluggable fetcher and enforced with stdlib robotparser before a
wave is fetched.
"""

from __future__ import annotations

from urllib import robotparser
from urllib.parse import urlsplit, urlunsplit

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crawler_spark.functions.html import domain_allowed
from crawler_spark.plans.ingest import (
    fetch_frontier,
    parse_stage,
    split_dead_letter,
)
from crawler_spark.sources.fetch import Fetcher


def _robots_disallowed(fetcher: Fetcher, urls: list[str], user_agent: str = "*") -> set[str]:
    """urls disallowed by their domain's robots.txt (missing/unfetchable
    robots.txt ⇒ everything allowed, like Scrapy's default)."""
    parsers: dict[str, robotparser.RobotFileParser | None] = {}
    out: set[str] = set()
    for url in urls:
        parts = urlsplit(url)
        origin = (parts.scheme, parts.netloc)
        if origin not in parsers:
            robots_url = urlunsplit((parts.scheme, parts.netloc, "/robots.txt", "", ""))
            _, body, err = fetcher.fetch(robots_url)
            if err is not None or body is None:
                parsers[origin] = None
            else:
                rp = robotparser.RobotFileParser()
                rp.parse(body.decode("utf-8", errors="replace").splitlines())
                parsers[origin] = rp
        rp = parsers[origin]
        if rp is not None and not rp.can_fetch(user_agent, url):
            out.add(url)
    return out


def crawl(
    spark: SparkSession,
    fetcher: Fetcher,
    seed_urls: list[str],
    allowed_domains: list[str] | None = None,
    depth_limit: int = 1,
    obey_robots: bool = True,
    max_urls_per_wave: int = 100_000,
) -> tuple[DataFrame, DataFrame]:
    """BFS-crawl from seeds; returns (items, dead_letter).

    items = parsed PAGE_ITEM rows for every fetched page across all
    waves (callers feed them to embed_stage/finalize_pages/merge —
    plans/ingest.py). Wave n+1's frontier = links of wave n, domain-
    filtered (P6), deduped against every url already visited (D3).
    """
    visited: set[str] = set()
    frontier = [u for u in dict.fromkeys(seed_urls)
                if domain_allowed(u, allowed_domains)]
    waves_items: list[DataFrame] = []
    waves_dead: list[DataFrame] = []

    for _depth in range(depth_limit + 1):
        if not frontier:
            break
        if obey_robots:
            blocked = _robots_disallowed(fetcher, frontier)
            frontier = [u for u in frontier if u not in blocked]
        if not frontier:
            break
        visited.update(frontier)

        fetched = fetch_frontier(spark, fetcher, frontier[:max_urls_per_wave])
        items = parse_stage(fetched)
        ok, dead = split_dead_letter(items)
        ok = ok.cache()  # consumed twice: results + next frontier
        waves_items.append(ok)
        waves_dead.append(dead)

        if _depth == depth_limit:
            break
        # next frontier: explode links, filter allowed domains, dedup
        links = [
            r.link
            for r in ok.select(F.explode("links").alias("link")).distinct().collect()
        ]
        frontier = [
            u for u in dict.fromkeys(links)
            if u not in visited and domain_allowed(u, allowed_domains)
        ]

    if not waves_items:
        from crawler_spark import schemas

        empty = spark.createDataFrame([], schemas.PAGE_ITEM)
        return empty, empty.select("url", "error")

    items = waves_items[0]
    for w in waves_items[1:]:
        items = items.unionByName(w)
    dead = waves_dead[0]
    for w in waves_dead[1:]:
        dead = dead.unionByName(w)
    # D3: a url reachable from several pages is fetched once per crawl
    return items.dropDuplicates(["url"]), dead.select("url", "error")
