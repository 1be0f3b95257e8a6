"""Incrementally-maintained aggregate views over a CDC lake table.

Classic incremental view maintenance (IVM) for ``GROUP BY`` aggregates,
specialized to the CDC lake: a view ``SELECT g..., COUNT(*), SUM(x),
AVG(y) FROM base GROUP BY g...`` is materialized as a second
:class:`~tap_postgres_spark.lake.table.LakeTable` keyed on the group
columns and kept current at **O(|changes| + |touched groups|)** per
refresh — never O(|table|).  At 10^10 rows this is the difference
between a dashboard that follows the stream and one that re-reads
100 TB per tick.

Mechanism (all distributive-aggregate delta math, no recompute):

1. ``base.read_changes(from_v, to_v)`` — the folded changelog: the
   LATEST image of every key touched in the range, tombstones included.
2. The OLD image of exactly those keys, from the base snapshot at
   ``from_v`` — a bucket-pruned point read (``buckets_for_keys`` +
   broadcast ``LEFT SEMI`` applied BELOW the LWW fold via
   ``read(semi_keys=...)``), so it scans only the touched buckets,
   ships only the changed-key set, and folds only the matching rows
   (the same large-key-set strategy as :meth:`LakeTable.read_keys`).
3. Per group: ``delta = contrib(new live images) − contrib(old
   images)``.  A key whose group column changed subtracts from the old
   group and adds to the new one; an insert has no old image; a delete
   has no new contribution — all three fall out of the same full-outer
   combine.  Groups whose delta is entirely zero are dropped before any
   further I/O.
4. The CURRENT view rows for the touched groups (a point read on the
   view — the group columns ARE its keys, so bucket pruning applies),
   plus the delta, gives the new absolute rows.  Groups whose live-row
   count reaches zero are tombstoned; a group that reappears later
   simply wins by LSN.  The merge commits under epoch id
   ``aggview-from-base-v{to_v}`` so crashed refreshes replay as no-ops
   (the same exactly-once guard as ingest and ``lake/derived.py``).

Supported aggregates — the self-maintainable (distributive) family:
``count`` (live rows), ``count_col`` (non-NULL values), ``sum``,
``avg`` (maintained as sum + non-NULL count), plus ``min``/``max``.
The extrema are not self-maintainable under deletes (the classic IVM
result: retracting the current minimum needs data no delta carries), so
they run two-tier: a pure-insert refresh range (the changed keys have
NO old images at the from-version — one tiny guarded action proves it)
keeps the monotone ``least``/``greatest`` delta path at O(|changes|);
a churned range recomputes the extremal columns for EXACTLY the
churned groups from the base snapshot at ``to_v`` — one narrow-column
scan folded only over those groups' rows, additive columns and
untouched groups still pure delta.  Append-only fact tables therefore
never pay the scan; for workloads that retract extrema every tick, key
a derived table by the group instead so the recompute prunes.

SQL NULL semantics are preserved: each ``sum``/``avg`` also maintains
its non-NULL input count, and :func:`read_aggregate_view` renders the
column NULL when that count is zero (``SUM`` over an all-NULL group is
NULL, not 0 — the storage delta math uses 0 internally).

Floating-point caveat: a delta-maintained ``double`` sum reorders the
additions relative to a one-shot recompute, so the two agree to ~1e-12
relative error, not bit-exactly.  Integer and decimal sums are exact —
declare the base column ``decimal`` where exactness matters.

Reference parity note: the reference tap stops at the Singer message
stream (client.py:234-260 hands bookmarks downstream); this is the
Spark-side continuation — the same bookmark contract that enables
incremental extraction enables incremental aggregation.
"""

from __future__ import annotations

import functools
import operator
from dataclasses import dataclass
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..schema import SDC_DELETED_AT, SDC_LSN
from .derived import refreshed_base_version
from .table import LakeTable

_EPOCH_PREFIX = "aggview-from-base-v"
_CNT = "__cnt"  # live-row count: liveness witness, always maintained

_KINDS = ("count", "count_col", "sum", "avg", "min", "max")
_EXTREMAL = ("min", "max")


@dataclass(frozen=True)
class Agg:
    """One aggregate column of the view.

    ``kind``: ``count`` (live rows; ``col`` ignored), ``count_col``
    (non-NULL values of ``col``), ``sum``, ``avg``, ``min``, ``max``.
    ``name``: the output column (must be unique, and distinct from the
    group columns).

    ``min``/``max`` are delta-maintained on pure-insert refresh ranges;
    a range that touches EXISTING keys (updates or deletes) triggers a
    recompute of the extremal columns for the churned groups only — see
    the module docstring for the cost model.
    """

    kind: str
    col: str | None
    name: str

    def __post_init__(self) -> None:
        if self.kind not in _KINDS:
            raise ValueError(
                f"unsupported aggregate kind {self.kind!r}; supported: {_KINDS}"
            )
        if self.kind != "count" and not self.col:
            raise ValueError(f"{self.kind} needs an input column")


def _storage_cols(aggs: list[Agg]) -> list[tuple[str, str]]:
    """(storage column, contribution kind) pairs, deduplicated.

    Contribution kinds: ``rows`` (count of rows), ``nn:<col>`` (count of
    non-NULL <col>), ``sum:<col>`` (NULL-skipping sum), ``min:<col>`` /
    ``max:<col>`` (extrema: delta on insert-only ranges, churned-group
    recompute otherwise).
    """
    out: list[tuple[str, str]] = [(_CNT, "rows")]
    for a in aggs:
        if a.kind == "count":
            continue  # rendered from _CNT
        if a.kind == "count_col":
            out.append((a.name, f"nn:{a.col}"))
        elif a.kind in ("sum", "avg"):
            out.append((f"__s_{a.name}", f"sum:{a.col}"))
            out.append((f"__n_{a.name}", f"nn:{a.col}"))
        elif a.kind in _EXTREMAL:
            out.append((a.name, f"{a.kind}:{a.col}"))
    seen: set[str] = set()
    dedup = []
    for name, contrib in out:
        if name in seen:
            raise ValueError(f"duplicate aggregate output name {name!r}")
        seen.add(name)
        dedup.append((name, contrib))
    return dedup


def _contrib_exprs(aggs: list[Agg]) -> list:
    """Aggregation expressions computing each storage column's
    contribution over a relation of live base rows."""
    exprs = []
    for name, contrib in _storage_cols(aggs):
        if contrib == "rows":
            exprs.append(F.count(F.lit(1)).alias(name))
        elif contrib.startswith("nn:"):
            exprs.append(F.count(F.col(contrib[3:])).alias(name))
        elif contrib.startswith("min:"):
            exprs.append(F.min(contrib[4:]).alias(name))
        elif contrib.startswith("max:"):
            exprs.append(F.max(contrib[4:]).alias(name))
        else:  # sum:<col> — coalesced so delta arithmetic never sees NULL
            exprs.append(
                F.coalesce(F.sum(contrib[4:]), F.lit(0)).alias(name)
            )
    return exprs


def _is_extremal(contrib: str) -> bool:
    return contrib.startswith(("min:", "max:"))


def _sub0(l, r):  # additive delta: NULLs are absent contributions
    return F.coalesce(l, F.lit(0)) - F.coalesce(r, F.lit(0))


def _add0(l, r):
    return F.coalesce(l, F.lit(0)) + F.coalesce(r, F.lit(0))


def _take_left(l, _r):  # extremal delta: the minus side is provably empty
    return l


def _nullskip_extreme(fn):
    def _c(l, r):
        return F.when(l.isNull(), r).when(r.isNull(), l).otherwise(fn(l, r))

    return _c


def _nullsafe_outer_combine(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    combiners: "list[tuple[str, Any]]",
) -> DataFrame:
    """Full-outer join on ``on`` with NULL-safe equality (a NULL group
    value — e.g. an un-tagged ``lang`` — is one group, exactly as
    ``GROUP BY`` treats it; a plain join condition would split it into
    two rows that the view's keyed merge would then collapse
    arbitrarily).  ``combiners``: (column, combine(l, r)) per storage
    column — additive columns coalesce NULL to 0 inside their combiner,
    extremal ones skip NULLs instead (0 is a legitimate extremum)."""
    cols = [c for c, _ in combiners]
    # dataset aliases, not DataFrame column refs: the two sides may
    # share plan lineage (delta feeds the view point read that becomes
    # the other side), which makes df[col] references ambiguous
    l = left.select(*on, *[F.col(c).alias(f"__l_{c}") for c in cols]).alias("__l")
    r = right.select(*on, *[F.col(c).alias(f"__r_{c}") for c in cols]).alias("__r")
    cond = functools.reduce(
        operator.and_,
        [F.col(f"__l.{g}").eqNullSafe(F.col(f"__r.{g}")) for g in on],
    )
    return l.join(r, cond, "full_outer").select(
        *[
            F.coalesce(F.col(f"__l.{g}"), F.col(f"__r.{g}")).alias(g)
            for g in on
        ],
        *[
            combine(F.col(f"__l_{c}"), F.col(f"__r_{c}")).alias(c)
            for c, combine in combiners
        ],
    )


def _overwrite_extrema(
    base: LakeTable,
    merged: DataFrame,
    churned: DataFrame,
    group_cols: list[str],
    storage: list[tuple[str, str]],
    need: list[str],
    to_v: int,
) -> DataFrame:
    """Replace the extremal storage columns of the churned groups with
    values recomputed from the base snapshot at ``to_v``.

    The recompute relation is the base head narrowed to the view's input
    columns, NULL-safe-semi-joined (broadcast) to the churned group set,
    and folded per group — O(one narrow scan + churned groups' rows),
    additive columns untouched.  A churned group with no live rows at
    head simply has no recompute row; its ``__cnt`` delta is ≤ 0, so the
    caller tombstones it and the stale extremum never surfaces."""
    extremal = [(n, c) for n, c in storage if _is_extremal(c)]
    rec_exprs = [
        (F.min if c.startswith("min:") else F.max)(c[4:]).alias(n)
        for n, c in extremal
    ]
    ch = churned.alias("__g")
    head = base.read(version=to_v, columns=need).alias("__h")
    sem = functools.reduce(
        operator.and_,
        [F.col(f"__h.{g}").eqNullSafe(F.col(f"__g.{g}")) for g in group_cols],
    )
    rec = (
        head.join(F.broadcast(ch), sem, "left_semi")
        .groupBy(*group_cols)
        .agg(*rec_exprs)
        .select(
            *group_cols,
            F.lit(True).alias("__rec"),
            *[F.col(n).alias(f"__rec_{n}") for n, _ in extremal],
        )
    )
    m = merged.alias("__m")
    r = rec.alias("__r")
    cond = functools.reduce(
        operator.and_,
        [F.col(f"__m.{g}").eqNullSafe(F.col(f"__r.{g}")) for g in group_cols],
    )
    ex_names = {n for n, _ in extremal}
    return m.join(F.broadcast(r), cond, "left").select(
        *[F.col(f"__m.{g}").alias(g) for g in group_cols],
        *[
            # the marker (not the value) gates the overwrite: a churned
            # group whose live inputs are all NULL must become NULL, not
            # keep the stale pre-retraction extremum
            F.when(F.col("__r.__rec"), F.col(f"__r.__rec_{n}"))
            .otherwise(F.col(f"__m.{n}"))
            .alias(n)
            if n in ex_names
            else F.col(f"__m.{n}").alias(n)
            for n, _ in storage
        ],
    )


def _input_columns(group_cols: list[str], aggs: list[Agg]) -> list[str]:
    """The only base columns the view reads — passed as read(columns=)
    so the scans are as narrow as the view (the LWW fold otherwise
    forces the full row width off parquet)."""
    out = list(group_cols)
    for a in aggs:
        if a.col and a.col not in out:
            out.append(a.col)
    return out


def _validate(base: LakeTable, group_cols: list[str], aggs: list[Agg]) -> None:
    cols = set(base.schema.fieldNames())
    for g in group_cols:
        if g not in cols:
            raise ValueError(f"group column {g!r} not in base schema")
    names = set(group_cols)
    for a in aggs:
        if a.kind != "count" and a.col not in cols:
            raise ValueError(f"aggregate input {a.col!r} not in base schema")
        if a.name in names:
            raise ValueError(f"aggregate name {a.name!r} collides")
        names.add(a.name)


def bootstrap_aggregate_view(
    spark: SparkSession,
    base: LakeTable,
    view_path: str,
    group_cols: list[str],
    aggs: list[Agg],
    *,
    num_buckets: int | None = None,
) -> LakeTable:
    """Create the view from one full group-by over the base head — the
    single O(|table|) pass; every later :func:`refresh_aggregate_view`
    is O(|changes|).  The view is a LakeTable keyed on ``group_cols``;
    storage columns are internal (read through
    :func:`read_aggregate_view` for SQL-shaped output)."""
    _validate(base, group_cols, aggs)
    to_v = base.current_version()
    live = base.read(columns=_input_columns(group_cols, aggs))
    contrib = live.groupBy(*group_cols).agg(*_contrib_exprs(aggs))
    batch = contrib.select(
        *contrib.columns,
        F.lit(to_v).cast("long").alias(SDC_LSN),
        F.lit(None).cast("string").alias(SDC_DELETED_AT),
    )
    schema = T.StructType(list(batch.schema.fields))
    view = LakeTable.create(
        spark,
        view_path,
        schema,
        list(group_cols),
        num_buckets=num_buckets if num_buckets is not None else base.num_buckets,
    )
    view.merge_into(batch, epoch_id=f"{_EPOCH_PREFIX}{to_v}")
    return view


def refresh_aggregate_view(
    base: LakeTable,
    view: LakeTable,
    aggs: list[Agg],
    *,
    to_version: int | None = None,
) -> dict[str, Any]:
    """Bring the view up to the base head by delta-applying ONLY the
    changed keys' contributions (module docstring has the math).

    Shares the changelog constraints of ``lake/derived.py``: the range
    must not cross the retention floor (``read_changes`` raises — the
    base snapshot at ``from_v`` must also still be readable), and
    compact commits in the range are pass-through.  On a floor raise,
    re-bootstrap the view."""
    group_cols = view.key_columns
    from_v = refreshed_base_version(view, _EPOCH_PREFIX)
    to_v = to_version if to_version is not None else base.current_version()
    if to_v <= from_v:
        return {"skipped": True, "refreshed_version": from_v}

    # the folded changelog carries a shuffle (per-key LWW fold) and is
    # consumed by four subtrees (bucket-id collect, the old read's semi
    # side, the plus contributions, the extremal guard) — persist the
    # O(|changes|) relation rather than re-shuffling it per consumer
    need = _input_columns(group_cols, aggs)
    changed = base.read_changes(from_v, to_v, columns=need).persist()
    delta = None
    churned = None
    try:
        key_cols = base.key_columns
        changed_keys = changed.select(*key_cols).distinct()
        # old images: bucket-pruned snapshot read at from_v, semi-joined to
        # the changed keys — only the touched buckets are scanned and only
        # the key set ships (read_keys' large-set strategy; read_keys itself
        # reads the HEAD, this needs the from_v snapshot)
        old = base.read(
            version=from_v,
            # bucket ids computed under from_v's layout: a rebucket
            # between from_v and the head changes the bucket count
            buckets=base.buckets_for_keys(changed_keys, version=from_v),
            # semi filter BELOW the LWW fold: fold work stays O(changed
            # keys' rows), not O(pruned buckets)
            semi_keys=changed_keys,
            # and only the view's input columns come off parquet
            columns=need,
        )
        new_live = changed.filter(F.col(SDC_DELETED_AT).isNull())

        storage = _storage_cols(aggs)
        extremal = [(n, c) for n, c in storage if _is_extremal(c)]
        # min/max retraction (round-5): an update/delete of an existing
        # key could retract a group's current extremum, which no delta
        # can express (MIN/MAX are not self-maintainable under deletes —
        # the classic IVM result).  The fix is surgical: the groups whose
        # keys have OLD images (and only those) get their extremal
        # columns recomputed from the base snapshot at to_v; every other
        # group — and every additive column everywhere — keeps the pure
        # O(|changes|) delta path.  Cost on a churned range: ONE
        # narrow-column scan of the base folded only over the churned
        # groups' rows (the base is bucketed by its keys, so group
        # pruning is impossible by construction; for workloads that
        # retract extrema every tick, key a derived table by the group
        # instead).  Pure-insert ranges skip this block entirely.
        if extremal and old.limit(1).count() > 0:
            churned = old.select(*group_cols).distinct().persist()
        exprs = _contrib_exprs(aggs)
        store = [n for n, _ in storage]
        plus = new_live.groupBy(*group_cols).agg(*exprs)
        minus = old.groupBy(*group_cols).agg(*exprs)
        delta = _nullsafe_outer_combine(
            plus,
            minus,
            group_cols,
            [(n, _take_left if _is_extremal(c) else _sub0) for n, c in storage],
        ).filter(
            # an update that left the group and every input unchanged
            # contributes nothing — drop it before the view point read.
            # __cnt's delta covers the extremal columns: an insert-only
            # range (the only legal one for min/max) always bumps it
            functools.reduce(
                operator.or_,
                [
                    F.abs(F.col(n)) > 0
                    for n, c in storage
                    if not _is_extremal(c)
                ],
            )
        )
        # the delta subtree contains the changelog scan AND the old-image
        # point read; it is consumed three times (bucket-id collect, the
        # view point read's semi side, the merge write) but is only
        # |touched groups| tiny rows — persist it instead of re-scanning
        delta = delta.persist()
        touched = delta.select(*group_cols).distinct()
        if churned is not None:
            # churned groups may have a zero additive delta (e.g. an
            # update that only moved the extremal input) — they must
            # still reach the view point read and the overwrite below
            touched = touched.union(churned).distinct()
        current = view.read(
            buckets=view.buckets_for_keys(touched), semi_keys=touched
        ).select(*group_cols, *store)
        merged = _nullsafe_outer_combine(
            current,
            delta,
            group_cols,
            [
                (
                    n,
                    _nullskip_extreme(
                        F.least if c.startswith("min:") else F.greatest
                    )
                    if _is_extremal(c)
                    else _add0,
                )
                for n, c in storage
            ],
        )
        if churned is not None:
            merged = _overwrite_extrema(
                base, merged, churned, group_cols, storage, need, to_v
            )
        dead = F.col(_CNT) <= 0
        batch = merged.select(
            *group_cols,
            *store,
            F.lit(to_v).cast("long").alias(SDC_LSN),
            F.when(dead, F.lit("1970-01-01T00:00:00Z"))
            .otherwise(F.lit(None).cast("string"))
            .alias(SDC_DELETED_AT),
        )
        summary = view.merge_into(batch, epoch_id=f"{_EPOCH_PREFIX}{to_v}")
    finally:
        if delta is not None:
            delta.unpersist()
        if churned is not None:
            churned.unpersist()
        changed.unpersist()
    return {
        "skipped": bool(summary.get("skipped")),
        "from_version": from_v,
        "to_version": to_v,
        "view_version": summary.get("version"),
        "extremal_recompute": churned is not None,
    }


def read_aggregate_view(view: LakeTable, aggs: list[Agg]) -> DataFrame:
    """SQL-shaped view contents: group columns + one column per ``Agg``
    with standard SQL semantics (``SUM``/``AVG`` are NULL over groups
    with no non-NULL input; counts are 0-free because dead groups are
    tombstoned away)."""
    df = view.read()
    group_cols = view.key_columns
    out = [F.col(g) for g in group_cols]
    for a in aggs:
        if a.kind == "count":
            out.append(F.col(_CNT).alias(a.name))
        elif a.kind in ("count_col", *_EXTREMAL):
            out.append(F.col(a.name))
        elif a.kind == "sum":
            out.append(
                F.when(F.col(f"__n_{a.name}") > 0, F.col(f"__s_{a.name}"))
                .alias(a.name)
            )
        else:  # avg
            out.append(
                F.when(
                    F.col(f"__n_{a.name}") > 0,
                    F.col(f"__s_{a.name}") / F.col(f"__n_{a.name}"),
                ).alias(a.name)
            )
    return df.select(*out)
