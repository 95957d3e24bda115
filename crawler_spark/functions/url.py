"""URL canonicalization as pure Column expressions — the real-world
upgrade over the reference's exact-string url dedup (its UNIQUE(url)
treats ``http://A/x?utm_source=y#f`` and ``http://a/x`` as different
pages; reference backend/src/models.py:26, db.py:48).

Rules applied (a conservative subset; note that tracking-param and
trailing-slash removal are near-universal but not strictly identity-
preserving on every server):
  * scheme and host lowercased (path case is preserved — it is
    significant on most servers);
  * default ports stripped (:80 for http, :443 for https);
  * fragment stripped;
  * tracking query parameters removed (utm_*, gclid, fbclid), the
    remaining query kept in original order (parameter REORDERING can
    change semantics on some servers, so none happens);
  * empty query dropped;
  * trailing slash normalized off non-root paths; a bare authority
    gets "/".

Everything is regexp_replace/lower chains — JVM-side, codegen-
friendly, usable inside the crawl loop's dedup without a UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ColumnOrName = Column | str


def _c(col: ColumnOrName) -> Column:
    return F.col(col) if isinstance(col, str) else col


# Anchored to a parameter boundary ([?&]) so 'xgclid=5' or a
# 'utm_source=' substring inside a path segment is never touched; the
# boundary char is kept via $1 and separators tidied after.
_TRACKING = r"([?&])(utm_[A-Za-z0-9_]*|gclid|fbclid)=[^&#]*"


def normalize_url(col: ColumnOrName) -> Column:
    """Canonical form of an absolute http(s) URL (non-http(s) strings
    pass through with only fragment/tracking cleanup applied)."""
    u = _c(col)
    # 1. drop the fragment
    u = F.regexp_replace(u, r"#.*$", "")
    # 2. drop tracking params (the [?&] boundary is re-emitted, so a
    #    run like ?a=1&utm_x=1&utm_y=2 leaves ?a=1&& for step 3)
    u = F.regexp_replace(u, _TRACKING, r"$1")
    # 3. tidy separators left behind: "?&" -> "?", "&&" -> "&",
    #    trailing "?"/"&" dropped
    u = F.regexp_replace(u, r"\?&+", "?")
    u = F.regexp_replace(u, r"&{2,}", "&")
    u = F.regexp_replace(u, r"[?&]+$", "")
    # 4. lowercase scheme://host[:port] (group 1), keep the rest
    u = F.concat(
        F.lower(F.regexp_extract(u, r"^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)?", 1)),
        F.regexp_replace(u, r"^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)?", ""),
    )
    # 5. strip default ports
    u = F.regexp_replace(u, r"^(http://[^/:?#]*):80(?=[/?#]|$)", r"$1")
    u = F.regexp_replace(u, r"^(https://[^/:?#]*):443(?=[/?#]|$)", r"$1")
    # 6. trailing slash off non-root paths (no query present after it)
    u = F.regexp_replace(u, r"^(https?://[^?#]+[^/?#])/$", r"$1")
    # 7. bare authority gets the root path
    u = F.regexp_replace(u, r"^(https?://[^/?#]+)$", r"$1/")
    return u


# --- domain-blocklist filtering ----------------------------------------------

# Above this many entries the blocklist stops inlining as an array
# literal (a 10⁶-entry UT1 list dies at plan-build time well before
# execution) and switches to the explode + broadcast-semi plan.
BLOCKLIST_INLINE_LIMIT = 4096


def domain_suffixes(col: ColumnOrName) -> Column:
    """Label-suffix set of a hostname, built in-plan (sequence →
    transform → slice/array_join HOFs): ``a.b.c`` → ``[a.b.c, b.c,
    c]``. Registrable-suffix blocklist semantics are then ONE set
    membership — ``www.src3.example.com`` is caught by entry
    ``src3.example.com`` on a dot boundary, ``notsrc3.example.com``
    is not (substring matching over-blocks)."""
    labels = F.split(_c(col), r"\.")
    n = F.size(labels)
    return F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.array_join(F.slice(labels, i, n - i + 1), "."),
    )


def filter_blocked_domains(
    df: DataFrame,
    blocklist: list[str] | DataFrame,
    *,
    domain_col: str = "domain",
    key_col: str = "doc_id",
    inline_limit: int = BLOCKLIST_INLINE_LIMIT,
) -> DataFrame:
    """Drop rows whose ``domain_col`` equals a blocklist entry or sits
    under one on a dot boundary — the standard corpus-curation stage
    (UT1-style category lists, spam/adult domain feeds). Two plans,
    switched by blocklist size:

    * **small** (``len(blocklist) <= inline_limit``): the suffix set
      is tested with ``arrays_overlap`` against a broadcast-literal
      array — a PURE PROJECTION, zero shuffles, O(labels × |list|)
      JVM work per row. Right for the usual 10²-10³-entry lists.
    * **big** (longer lists, or a DataFrame side): the SAME suffix
      set feeds ``posexplode`` → broadcast LEFT SEMI on equality
      (an equi-join — never a nested-loop LIKE join) to find blocked
      (key, domain) rows, then a NULL-SAFE LEFT ANTI back on
      ``(key_col, domain_col)`` — BOTH columns, so a key that appears
      with several domains keeps its clean rows exactly like the
      per-row small arm (review-found: a key-only anti dropped the
      whole key, and a plain-equality anti LEAKED blocked rows whose
      key is NULL). One shuffle (the anti-join; AQE broadcasts it when
      the blocked set is small); the blocklist side is a broadcast
      either way — a 10⁶-entry list is ~50 MB, far under threshold.
      Beyond broadcast, bucket both sides on entry hash.

    A DataFrame blocklist contributes its FIRST column as the entry
    list (any column name). Matching is case-insensitive on both
    sides — DNS hostnames are, and UT1-style feeds are lowercase
    while real crawl domains aren't. A NULL domain yields NULL
    suffixes and is KEPT by both arms (no blocklist entry matches
    NULL) — matching SQL ``NOT EXISTS`` semantics."""
    suffixes = domain_suffixes(F.lower(_c(domain_col)))
    if isinstance(blocklist, list) and len(blocklist) <= inline_limit:
        blocked = F.array(*[F.lit(e.lower()) for e in blocklist])
        # coalesce: NULL overlap (NULL domain) must keep the row
        return df.filter(
            ~F.coalesce(F.arrays_overlap(suffixes, blocked), F.lit(False)))
    spark = df.sparkSession
    bl = (
        blocklist.select(
            F.lower(F.col(blocklist.columns[0])).alias("entry"))
        if isinstance(blocklist, DataFrame)
        else spark.createDataFrame(
            [(e.lower(),) for e in blocklist], "entry string")
    )
    blocked = (
        df.select(key_col, domain_col,
                  F.explode(suffixes).alias("_sfx"))
        .join(F.broadcast(bl), F.col("_sfx") == F.col("entry"), "left_semi")
        .select(F.col(key_col).alias("_bk"), F.col(domain_col).alias("_bd"))
    )
    # NULL-SAFE anti equality on the key (review-found): a NULL-key
    # row with a blocked domain sits in `blocked`, but a plain
    # equality anti-join never matches NULL = NULL and would KEEP the
    # row — while the small arm's per-row filter drops it. eqNullSafe
    # (<=>) keeps this a hash join, so the plan lock still holds.
    cond = (_c(key_col).eqNullSafe(F.col("_bk"))
            & _c(domain_col).eqNullSafe(F.col("_bd")))
    return df.join(blocked, cond, "left_anti")
