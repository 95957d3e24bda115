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

from pyspark.sql import Column
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
