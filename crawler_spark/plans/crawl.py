"""Depth-limited BFS crawl (SURVEY.md §2.10 D1-D3, §3.2).

The reference crawls with a Scrapy CrawlSpider: LinkExtractor over
('a','img') restricted to allowed domains, DEPTH_LIMIT waves, request
dupefilter + unique(url) upsert (dynamic_spider.py:13-25,
settings.py:10, models.py:26). Here each wave is one distributed
fetch+parse pass, and BOTH the frontier and the visited set are
DataFrames end-to-end: the next wave's frontier is
``links.left_anti(visited)`` — a distributed join, never a driver-side
Python set — so a frontier of billions of links dedups on the cluster.
The only thing that ever reaches the driver is the *bounded* per-wave
fetch list (≤ ``max_urls_per_wave`` rows), which the driver needs
anyway to hand the fetcher its work. Frontier overflow beyond the cap
is NOT lost and NOT marked visited: it carries into the next wave's
frontier, and the truncation is surfaced through ``on_truncate``.

Per-wave ``localCheckpoint`` keeps the visited/frontier plans shallow
across waves (lineage would otherwise grow linearly with depth).

robots.txt (P8, settings.py:7): per-domain robots fetched through the
same pluggable fetcher and enforced with stdlib robotparser before a
wave is fetched — checked ON THE EXECUTORS, partitioned by host so
each origin's robots.txt resolves once per partition
(ingest.robots_filter); the driver never loops over domains.
"""

from __future__ import annotations

import warnings
from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from crawler_spark.plans.ingest import (
    fetch_frontier,
    parse_stage,
    robots_allowed_map,
    robots_filter,
    split_dead_letter,
)
from crawler_spark.sources.fetch import Fetcher

# waves at or below this size check robots driver-side — launching a
# Spark stage to vet a handful of urls costs more than the check
_ROBOTS_DISTRIBUTED_MIN = 1024


def _save_state(df: DataFrame, path: str) -> None:
    """Durable crawl state: write-then-rename so a crash mid-save keeps
    the previous state intact (the df is eagerly checkpointed, so the
    write never reads the path it replaces)."""
    import os
    import shutil

    tmp = path + ".tmp"
    df.write.mode("overwrite").parquet(tmp)
    if os.path.isdir(path):
        shutil.rmtree(path)
    os.replace(tmp, path)


def domain_allowed_col(url_col: str | Column, allowed_domains: list[str] | None) -> Column:
    """Scrapy OffsiteMiddleware rule as a pure expression: host equals
    an allowed domain or is a subdomain of one (dynamic_spider.py:16).
    No domains configured ⇒ everything allowed. Runs JVM-side so the
    frontier filter is distributed (P6)."""
    if not allowed_domains:
        return F.lit(True)
    host = F.lower(F.parse_url(url_col, F.lit("HOST")))
    arr = F.array(*[F.lit(d.lower()) for d in allowed_domains])
    return F.exists(arr, lambda d: (host == d) | host.endswith(F.concat(F.lit("."), d)))


def crawl(
    spark: SparkSession,
    fetcher: Fetcher,
    seed_urls: list[str],
    allowed_domains: list[str] | None = None,
    depth_limit: int = 1,
    obey_robots: bool = True,
    max_urls_per_wave: int = 100_000,
    on_truncate: Callable[[int, int], None] | None = None,
    state_dir: str | None = None,
    resume: bool = False,
    fetch_retries: int = 3,
    per_host_delay: float = 0.0,
    canonical_urls: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """BFS-crawl from seeds; returns (items, dead_letter).

    The fetcher gets the reference's D4 retry policy BY DEFAULT
    (``fetch_retries`` bounded re-attempts before a url dead-letters,
    reference tasks.py:20-25); pass ``fetch_retries=0`` to opt out.

    items = parsed PAGE_ITEM rows for every fetched page across all
    waves (callers feed them to embed_stage/finalize_pages/merge —
    plans/ingest.py). Wave n+1's frontier = links of wave n, domain-
    filtered (P6), minus every url already attempted (D3), plus any
    overflow truncated off wave n by ``max_urls_per_wave``.

    ``on_truncate(observed, cap)`` fires when a wave exceeds the cap
    (default: a warning); ``observed`` is a lower bound (cap+1) — the
    frontier is never fully counted just to report the excess. Silent
    frontier loss is a correctness bug at scale, so truncation is
    always surfaced and the overflow is kept.

    ``state_dir`` makes the crawl crash-resumable: after every wave the
    visited and next-frontier DataFrames persist as parquet, and
    ``resume=True`` restarts from that state instead of the seeds
    (already-attempted urls are never refetched — the reference's
    dupefilter semantics across restarts). Resume restores FRONTIER
    state only; completed waves' items were already handed to the
    caller (or the streaming sink) — a restarted call returns items
    from the remaining waves.
    """
    import os

    from crawler_spark.sources.fetch import with_default_retries

    fetcher = with_default_retries(fetcher, fetch_retries)

    def _canon(df: DataFrame) -> DataFrame:
        # ``canonical_urls``: dedup/visited keys are CANONICAL urls
        # (functions/url.normalize_url — tracking params, fragments,
        # default ports, case), so link-variant spam of one page costs
        # one fetch instead of one per variant. Off by default: the
        # reference dedups on the exact string (models.py:26).
        if not canonical_urls:
            return df
        from crawler_spark.functions.url import normalize_url

        return df.select(normalize_url("url").alias("url"))
    allowed = domain_allowed_col("url", allowed_domains)
    visited_path = state_dir and os.path.join(state_dir, "visited")
    frontier_path = state_dir and os.path.join(state_dir, "frontier")
    if resume and state_dir and os.path.isdir(frontier_path):
        visited = (
            spark.read.parquet(visited_path)
            if os.path.isdir(visited_path)
            else spark.createDataFrame([], "url string")
        )
        # saved frontier may include urls attempted just before the
        # crash — never refetch an attempted url
        frontier = spark.read.parquet(frontier_path).join(
            visited, "url", "left_anti"
        )
    else:
        # distinct() AFTER _canon: distinct raw seeds can canonicalize
        # to the same URL, and a duplicated wave-0 frontier row means a
        # duplicated fetch and duplicated item/dead-letter rows (the
        # links branch below already dedups post-canonicalization)
        frontier = (
            _canon(
                spark.createDataFrame(
                    [(u,) for u in dict.fromkeys(seed_urls)], "url string"
                )
            )
            .filter(allowed)
            .distinct()
        )
        visited = spark.createDataFrame([], "url string")
    waves_items: list[DataFrame] = []
    waves_dead: list[DataFrame] = []

    for _depth in range(depth_limit + 1):
        # the ONE bounded driver materialization per wave: the fetcher's
        # work list, capped at max_urls_per_wave (+1 row to detect
        # truncation without a separate count job)
        head = frontier.limit(max_urls_per_wave + 1).collect()
        if not head:
            break
        if len(head) > max_urls_per_wave:
            if on_truncate is not None:
                on_truncate(len(head), max_urls_per_wave)
            else:
                warnings.warn(
                    f"crawl wave truncated: > {max_urls_per_wave} urls in "
                    "frontier; overflow carried to next wave",
                    stacklevel=2,
                )
            head = head[:max_urls_per_wave]
            wave = spark.createDataFrame(head, "url string")
            overflow = frontier.join(wave, "url", "left_anti")
        else:
            wave, overflow = frontier, None
        wave_urls = [r.url for r in head]
        fetch_urls = wave_urls
        if obey_robots:
            if len(wave_urls) <= _ROBOTS_DISTRIBUTED_MIN:
                robots_ok = robots_allowed_map(fetcher, wave_urls)
                fetch_urls = [u for u in wave_urls if robots_ok[u]]
            else:
                fetch_urls = [
                    r.url
                    for r in robots_filter(spark, fetcher, wave_urls)
                    .filter("allowed").collect()
                ]
        # every attempted url (robots-blocked included) is visited: never
        # retried. With durable state the checkpoint is eager so the
        # parquet save below reads materialized partitions, not the
        # state file it is about to overwrite.
        visited = visited.unionByName(wave).localCheckpoint(
            eager=state_dir is not None
        )
        if state_dir:
            _save_state(visited, visited_path)

        if fetch_urls:
            fetched = fetch_frontier(
                spark, fetcher, fetch_urls, per_host_delay=per_host_delay
            )
            items = parse_stage(fetched)
            ok, dead = split_dead_letter(items)
            ok = ok.cache()  # consumed twice: results + next frontier
            waves_items.append(ok)
            waves_dead.append(dead)
        else:
            ok = None

        last_wave = _depth == depth_limit
        if last_wave and state_dir is None:
            break
        # next frontier: explode links, domain-filter, anti-join visited —
        # all distributed; overflow from this wave rejoins the frontier.
        # With durable state the final wave still computes and saves it,
        # so a resumed crawl can continue one level deeper.
        if ok is not None:
            links = (
                _canon(ok.select(F.explode("links").alias("url")))
                .filter(allowed)
                .distinct()
            )
        else:
            links = spark.createDataFrame([], "url string")
        if overflow is not None:
            links = links.unionByName(overflow).distinct()
        frontier = links.join(visited, "url", "left_anti").localCheckpoint(
            eager=state_dir is not None
        )
        if state_dir:
            _save_state(frontier, frontier_path)
        if last_wave:
            break

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
