"""Skew-mitigation join: salting for hot or low-cardinality keys.

A shuffle join hashes rows to tasks BY KEY, so its parallelism is
bounded by the number of distinct keys and its balance by the key
histogram. Two shapes break it at scale:

* low-cardinality keys — a 5-value key uses at most 5 of the cluster's
  thousands of shuffle tasks, no matter how big the fact side is;
* hot keys — one key holding 10% of a 100 TB fact table sends 10 TB
  through a single task.

AQE's skew-join handling (on in ``session.get_spark``) splits oversized
partitions at runtime, but only for sort-merge joins and only after a
first skewed exchange materializes. Salting fixes the plan itself: the
fact side spreads each key over ``num_salts`` sub-keys and the (small
relative to fact, but too big or too hot to broadcast) dim side is
replicated once per salt, so the equi-join runs on (key, salt) with
``num_salts``× the parallelism. Replicating the dim is the explicit
price — use ``hot_keys`` to pay it only for the keys that need it,
joining the rest through the normal single-copy path.

No reference-repo analogue (psycopg2/Postgres has a planner, not a
shuffle); this is pure Spark scale hygiene demanded by the 100 TB
design brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    num_salts: int = 8,
    how: str = "inner",
    hot_keys: list | None = None,
    seed: int = 42,
) -> DataFrame:
    """Equi-join ``fact ⨝ dim`` on column ``on`` (same name both sides)
    with the fact side salted over ``num_salts`` sub-keys.

    ``hot_keys=None`` salts every key (right for low-cardinality keys,
    where ALL keys under-parallelize). A non-empty ``hot_keys`` list
    salts only those keys and routes the rest through a plain join —
    the production shape when a frequency scan has identified the heavy
    hitters (keep the list small; it travels in the plan as a literal).

    The salt value is ``floor(rand(seed) * num_salts)`` on the fact row:
    which salt a row gets never changes the join result (every dim
    replica carries the same payload), so a nondeterministic-but-seeded
    assignment is safe, keeps the salt uncorrelated with the data, and
    costs no extra column scan. Output column set and row multiset are
    identical to ``fact.join(dim, on, how)`` for ``how`` in
    ('inner', 'left'); dim-side hints (e.g. ``dim.hint('merge')``)
    survive into both paths.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports how='inner' or 'left'")
    if num_salts < 2:
        raise ValueError("num_salts must be >= 2 (1 would be a plain join)")

    salt = F.floor(F.rand(seed) * num_salts).cast("int")
    replicas = F.explode(
        F.sequence(F.lit(0), F.lit(num_salts - 1))
    ).alias("__salt")

    def _salted(f: DataFrame, d: DataFrame) -> DataFrame:
        fs = f.withColumn("__salt", salt)
        ds = d.select("*", replicas)
        return fs.join(ds, on=[on, "__salt"], how=how).drop("__salt")

    if hot_keys is None:
        return _salted(fact, dim)

    is_hot = F.col(on).isin(list(hot_keys))
    hot = _salted(fact.filter(is_hot), dim.filter(is_hot))
    cold = fact.filter(~is_hot | F.col(on).isNull()).join(dim, on=on, how=how)
    return hot.unionByName(cold)
