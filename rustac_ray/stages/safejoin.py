"""Central fence for Ray 2.49's ``Dataset.join`` empty-partition crash.

Ray 2.49's hash-shuffle join raises ``ArrowInvalid: No match for
FieldRef ... right side`` whenever a join partition receives ZERO right
rows: the empty partition's table is schema-less, so the per-partition
join can't resolve the key field. An empty partition is GUARANTEED when
``num_partitions`` exceeds the right side's distinct-key count, and
merely probable whenever keys-per-partition is small (balls-in-bins).
Every native-join callsite in this repo goes through :func:`safe_join`,
which sizes ``num_partitions`` from the right side's actual row count so
the expected keys-per-partition stays >= ``_MIN_KEYS_PER_PARTITION`` —
at 64, the chance any partition is empty is ~``p * e^-64`` per run,
i.e. never; below 2x that floor the join collapses to ONE partition,
where non-emptiness is deterministic.

The same clamp fences a SECOND Ray 2.49 failure mode, observed on this
host while pinning the first: the hash-shuffle join sizes its
aggregator-actor pool as ``min(num_partitions, max_shuffle_aggregators)``
with 1 CPU each (ray hash_shuffle.py:455,1198), so a
``num_partitions=32`` join inside a small session (e.g. a 4-CPU test
fixture) demands more aggregator CPUs than exist while upstream map
tasks hold the rest — the join HANGS on resource starvation rather than
raising (measured: >240s stuck vs 5s clamped, /tmp repro, r5s1). Joins
against small winner sets — both repo callsites — collapse to 1
partition = 1 aggregator and cannot starve.

This is a version-specific fence, not a semantic change: when a Ray
upgrade fixes the underlying bug (NOTES.md "Ray upgrade watch"), the
clamp simply stops binding for large inputs.
"""

from __future__ import annotations

__all__ = ["safe_join"]

# expected keys per hash partition below which we shrink the partition
# count; P(some partition empty) <= num_partitions * (1 - 1/p)^n ~
# p * e^-64 at the floor — vanishing for any p this repo uses
_MIN_KEYS_PER_PARTITION = 64


def safe_join(left, right, *, on, join_type: str = "inner",
              num_partitions: int = 32, right_count: "int | None" = None):
    """``left.join(right)`` with ``num_partitions`` clamped to the right
    side's row count (pass ``right_count`` if already known to skip the
    extra ``materialize``). The right side should be key-distinct (both
    repo callsites join winner-id sets) — duplicate right keys make the
    row count overestimate distinct keys and weaken the fence.

    An empty right side short-circuits inner/semi joins to an empty
    result with the left schema (a 0-partition join is unrepresentable).
    """
    if right_count is None:
        right = right.materialize()
        right_count = right.count()
    if right_count == 0:
        if join_type in ("inner", "left_semi"):
            return left.limit(0)
        if join_type == "left_anti":
            return left
        raise ValueError(
            f"safe_join: empty right side for join_type={join_type!r} "
            "has no well-defined fast path"
        )
    clamped = max(1, min(int(num_partitions),
                         int(right_count) // _MIN_KEYS_PER_PARTITION))
    return left.join(right, join_type=join_type, num_partitions=clamped,
                     on=on)
