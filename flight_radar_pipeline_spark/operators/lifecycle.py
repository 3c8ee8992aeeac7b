"""Cache lifecycle for operators that persist reused intermediates.

Several operators persist an intermediate that BOTH sides of a downstream
join consume (LSH signature tables, shingle sets, degree-capped edge
lists). The persist is correct — without it the expensive subtree runs
once per consumer — but the consuming action happens in the CALLER, so
the operator cannot unpersist before returning and the cache would
otherwise outlive its usefulness in a long-lived session (the round-6/7
ADVICE item: a library consumer who does not know the
``spark.catalog.clearCache()`` contract accumulates executor storage).

This module closes that in code instead of by contract:

- operators tag their returned DataFrame with the caches it holds via
  :func:`hold` (inherited transitively from upstream operator outputs);
- consumers release them after their action with :func:`release`, or
  scope the whole consume with :func:`persisted_scope`::

      with persisted_scope(cosine_near_dup_pairs(corpus)) as pairs:
          pairs.write.parquet(out)          # caches dropped on exit

- operators whose reuse happens INSIDE the operator (``mutual_nn_pairs``)
  materialize the reused table with an eager ``localCheckpoint`` and
  release upstream caches before returning — a default call holds ZERO
  entries in the SQL cache manager; checkpoint blocks are owned by the
  returned plan and reclaimed by the ContextCleaner when the DataFrame
  is garbage-collected, no contract required.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import DataFrame

_ATTR = "_frp_held_caches"


def hold(out: DataFrame, *sources: DataFrame) -> DataFrame:
    """Tag ``out`` as holding the persisted DataFrames in ``sources``;
    caches already held by a source (an upstream operator's output)
    are inherited, so release at the final consumer frees the whole
    chain. Identity-deduped; returns ``out`` for chaining.

    The tag lives on the exact Python object returned — a downstream
    transformation (``out.filter(...)``, ``out.select(...)``) builds a
    NEW DataFrame without it, so ``release``/``persisted_scope`` on the
    derived frame frees nothing. Wrap the operator's direct return
    value, or re-``hold`` the derived frame with the original as a
    source (``hold(derived, original)`` re-inherits the chain)."""
    held: list[DataFrame] = []
    seen: set[int] = set()
    for s in sources:
        for c in [*getattr(s, _ATTR, ()), s]:
            lvl = c.storageLevel
            if (lvl.useMemory or lvl.useDisk) and id(c) not in seen:
                seen.add(id(c))
                held.append(c)
    setattr(out, _ATTR, tuple(held))
    return out


def held(df: DataFrame) -> tuple[DataFrame, ...]:
    """The persisted intermediates ``df`` holds (possibly empty)."""
    return tuple(getattr(df, _ATTR, ()))


def release(df: DataFrame) -> None:
    """Unpersist every cache ``df`` holds. Call after the consuming
    action; safe to call twice (unpersist is idempotent) and on
    DataFrames that hold nothing. Pass the operator's DIRECT return
    value — a transformed copy carries no tag (see :func:`hold`)."""
    for c in getattr(df, _ATTR, ()):
        try:
            c.unpersist()
        except Exception:
            pass  # session torn down mid-release — nothing to free
    setattr(df, _ATTR, ())


@contextmanager
def persisted_scope(df: DataFrame):
    """``with persisted_scope(op(...)) as out:`` — run the consuming
    action inside the block; every operator-held cache is released on
    exit, success or failure."""
    try:
        yield df
    finally:
        release(df)
