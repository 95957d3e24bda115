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


def _commit_state(
    visited: DataFrame, frontier: DataFrame, state_dir: str, epoch: int
) -> None:
    """Publish (visited, frontier) as ONE atomic epoch.

    Round 10 persisted the two DataFrames with separate atomic saves,
    which left a cross-file window (review-found round 11): a crash
    between save(visited ∪ wave N) and save(frontier = wave N+1) put a
    STALE wave-N frontier on disk next to a visited set that already
    contained wave N — resume anti-joined the whole frontier away and
    silently abandoned the remaining crawl (the exact failure class the
    per-file atomic rename was built to close, reopened one level up).

    Now both DataFrames are written into one ``_epoch.tmp`` directory
    and published with a SINGLE ``os.rename`` to ``epoch_NNNNNN`` — the
    pair is either fully visible or not at all, and any published epoch
    is internally consistent (its frontier was anti-joined against its
    visited in the same wave). Older epochs are swept only AFTER the
    new one is live, so the newest complete epoch always exists. The
    caller eagerly checkpoints both DataFrames first, so no later plan
    references the swept directories."""
    import os
    import shutil

    tmp = os.path.join(state_dir, "_epoch.tmp")
    if os.path.isdir(tmp):  # half-written leftover from a crashed save
        shutil.rmtree(tmp)
    visited.write.mode("overwrite").parquet(os.path.join(tmp, "visited"))
    frontier.write.mode("overwrite").parquet(os.path.join(tmp, "frontier"))
    final = os.path.join(state_dir, f"epoch_{epoch:06d}")
    if os.path.isdir(final):  # defensive: never rename onto a live dir
        shutil.rmtree(final)
    os.rename(tmp, final)  # the commit point
    for name in os.listdir(state_dir):
        if (name.startswith("epoch_") and name[6:].isdigit()
                and int(name[6:]) < epoch):
            # pure cleanup past the commit point: resume always picks
            # the max epoch, so a transient IO failure deleting a
            # superseded epoch must not abort a wave that committed
            shutil.rmtree(os.path.join(state_dir, name),
                          ignore_errors=True)
        # retire pre-epoch (round-10) layout once an epoch is live: the
        # legacy dirs were only consulted by the resume fallback below,
        # and leaving them would shadow nothing but confuse inspection
        elif name in ("visited", "frontier", "visited.old",
                      "frontier.old", "visited.tmp", "frontier.tmp"):
            shutil.rmtree(os.path.join(state_dir, name), ignore_errors=True)


def _clear_state(state_dir: str) -> None:
    """Remove every epoch (and legacy/in-flight state) from a state
    dir. Called on a NON-resume crawl start (review-found round 11):
    epoch numbering restarts at 0 per run, so a leftover HIGHER epoch
    from a previous crawl would outrank every epoch the new run commits
    and a later resume would silently restore the ABANDONED crawl's
    frontier — the old overwrite-in-place layout reset state on reuse,
    and this preserves that contract."""
    import os
    import shutil

    if not os.path.isdir(state_dir):
        return
    for name in os.listdir(state_dir):
        if (name == "_epoch.tmp"
                or (name.startswith("epoch_") and name[6:].isdigit())
                or name in ("visited", "frontier", "visited.old",
                            "frontier.old", "visited.tmp", "frontier.tmp")):
            shutil.rmtree(os.path.join(state_dir, name), ignore_errors=True)


def _legacy_state(spark: SparkSession, state_dir: str):
    """Resume fallback for the pre-round-11 two-file layout
    (``visited``/``frontier`` dirs with ``.old`` crash fallbacks):
    without this, upgrading mid-crawl would silently restart from the
    seeds — the exact failure class the epoch rewrite closes. Returns
    (visited, frontier) DataFrames or None. The legacy pair is NOT
    atomic, so the frontier is re-anti-joined against visited exactly
    as the old reader did; the first epoch commit retires the legacy
    dirs."""
    import os

    def newest(path: str) -> str | None:
        if os.path.isdir(path):
            return path
        if os.path.isdir(path + ".old"):
            return path + ".old"
        return None

    front_src = newest(os.path.join(state_dir, "frontier"))
    if front_src is None:
        return None
    vis_src = newest(os.path.join(state_dir, "visited"))
    visited = (
        spark.read.parquet(vis_src)
        if vis_src is not None
        else spark.createDataFrame([], "url string")
    )
    frontier = (
        spark.read.parquet(front_src)
        .join(visited, "url", "left_anti")
        .localCheckpoint(eager=True)
    )
    return visited.localCheckpoint(eager=True), frontier


def _latest_epoch(state_dir: str | None) -> tuple[int, str] | None:
    """(epoch number, path) of the newest COMPLETE epoch directory, or
    None when the state dir holds none. ``_epoch.tmp`` (a crashed
    in-flight write) never matches — publication is the rename."""
    import os

    if not state_dir or not os.path.isdir(state_dir):
        return None
    epochs = sorted(
        int(n[6:]) for n in os.listdir(state_dir)
        if n.startswith("epoch_") and n[6:].isdigit()
    )
    if not epochs:
        return None
    return epochs[-1], os.path.join(state_dir, f"epoch_{epochs[-1]:06d}")


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
    robots_user_agent: str = "*",
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
    visited and next-frontier DataFrames publish together as ONE
    atomically-renamed parquet epoch (``epoch_NNNNNN/{visited,frontier}``
    — a consistent pair at every instant, see ``_commit_state``), and
    ``resume=True`` restarts from that state instead of the seeds
    (already-attempted urls are never refetched — the reference's
    dupefilter semantics across restarts). Resume restores FRONTIER
    state only; completed waves' items were already handed to the
    caller (or the streaming sink) — a restarted call returns items
    from the remaining waves. Durable ordering: each wave's results
    materialize BEFORE its urls persist as visited, so a crash at any
    point is at-least-once (the interrupted wave refetches on resume),
    never a silent loss of the remaining crawl.

    ``robots_user_agent`` is the agent token robots.txt rules match
    against (default ``*``): pass the crawler's real token so sites'
    bot-specific Disallow sections are honored, not just the wildcard
    section.
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
    if state_dir and not resume:
        # fresh run into a reused state dir: epoch numbering restarts,
        # so stale higher epochs (or legacy layout) must not survive to
        # outrank this run's commits on a later resume
        _clear_state(state_dir)
    latest = _latest_epoch(state_dir) if resume and state_dir else None
    legacy = (
        _legacy_state(spark, state_dir)
        if resume and state_dir and latest is None
        else None
    )
    epoch = latest[0] if latest is not None else 0
    if legacy is not None:
        visited, frontier = legacy
    elif latest is not None:
        # an epoch is internally consistent by construction (one atomic
        # rename published both halves, _commit_state): its frontier was
        # already anti-joined against its visited in the wave that
        # committed it, so no resume-time re-join is needed — attempted
        # urls are structurally absent. Eagerly checkpointed
        # (review-found): a lazy plan here still references the epoch's
        # parquet files, which the next _commit_state sweeps — a
        # truncated resumed wave's overflow would then scan deleted
        # paths and abort the crawl.
        _, epoch_dir = latest
        visited = spark.read.parquet(
            os.path.join(epoch_dir, "visited")).localCheckpoint(eager=True)
        frontier = spark.read.parquet(
            os.path.join(epoch_dir, "frontier")).localCheckpoint(eager=True)
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
    robots_parsers: dict = {}  # robots.txt memo shared across ALL waves

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
                # ONE parsers memo for the whole crawl (review-found):
                # a fresh dict per wave refetched every origin's
                # robots.txt each wave, ×(retries+1) on every miss
                robots_ok = robots_allowed_map(
                    fetcher, wave_urls, user_agent=robots_user_agent,
                    parsers=robots_parsers)
                fetch_urls = [u for u in wave_urls if robots_ok[u]]
            else:
                fetch_urls = [
                    r.url
                    for r in robots_filter(spark, fetcher, wave_urls,
                                           user_agent=robots_user_agent)
                    .filter("allowed").collect()
                ]

        # fetch + parse FIRST — materialized when durable (review-found
        # ordering): persisting visited before the fetch ran meant a
        # crash mid-fetch left every wave url "visited" with no results,
        # so resume found an empty frontier and silently abandoned the
        # rest of the crawl. Materializing results first makes a crash
        # anywhere at-least-once (the wave refetches on resume), never
        # silently-lost.
        if fetch_urls:
            fetched = fetch_frontier(
                spark, fetcher, fetch_urls, per_host_delay=per_host_delay
            )
            items = parse_stage(fetched)
            ok, dead = split_dead_letter(items)
            if state_dir:
                ok = ok.localCheckpoint(eager=True)
                dead = dead.localCheckpoint(eager=True)
            else:
                ok = ok.cache()  # consumed twice: results + next frontier
            waves_items.append(ok)
            waves_dead.append(dead)
        else:
            ok = None

        # every attempted url (robots-blocked included) is visited: never
        # retried. With durable state the checkpoint is eager so the
        # epoch commit below writes materialized partitions, not a lazy
        # plan over the epoch directory it is about to sweep. Nothing
        # persists HERE — visited and the next frontier publish together
        # in ONE atomic epoch after the frontier is computed, so no
        # crash can leave a visited set newer than its frontier.
        visited = visited.unionByName(wave).localCheckpoint(
            eager=state_dir is not None
        )

        last_wave = _depth == depth_limit
        if last_wave and state_dir is None:
            if overflow is not None:
                warnings.warn(
                    "final crawl wave truncated and state_dir is not "
                    "set: the overflow cannot carry anywhere and is "
                    "DROPPED — set state_dir to persist it for a "
                    "resumed run", stacklevel=2,
                )
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
            epoch += 1
            _commit_state(visited, frontier, state_dir, epoch)
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
