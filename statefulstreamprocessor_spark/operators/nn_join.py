"""Deterministic closure nearest-neighbor time-series join — pure Catalyst.

The production form of the reference's LocalStreamBuffer pairwise join
(reference ``05_LocalStreamBuffer/local_stream_buffer.py:237-315``): every
record pairs with its nearest other-side neighbor in each time direction,
with the backward ("previous-partner") pairing confirmed only when the
record also has a forward other-side partner — exactly the pair set the
reference emits under event-time-ordered arrival, and a deterministic,
arrival-order-invariant superset of what it emits under any other
interleaving (the guarantee its README:219-233 advertises).

Physical plan (scale notes):
  one hash exchange on the join key → ascending sort → running
  unbounded-preceding window passes (range frames for the ts-inclusive
  cross-side lookups + rows frames for same-side predicates, all O(n)) →
  descending sort (same exchange, sort only) → mirrored running passes →
  explode of per-row pair candidates. No join operator, no state blow-up,
  no shrinking (unbounded-following) frames — those re-aggregate per row;
  per-key cost is O(n log n) and keys parallelize perfectly across
  executors. A single pathological hot series is parallelized by
  ``nn_join_banded``.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "nn_join",
    "nn_join_one_source",
    "nn_join_banded",
    "PAIR_LEFT_PREFIX",
    "PAIR_RIGHT_PREFIX",
]

PAIR_LEFT_PREFIX = "r_"
PAIR_RIGHT_PREFIX = "s_"


def _side_struct(df: DataFrame, keys: list[str], ts_col: str) -> Column:
    payload = [c for c in df.columns if c not in keys]
    return F.struct(*[F.col(c) for c in payload])


def nn_join(
    df_r: DataFrame,
    df_s: DataFrame,
    keys: list[str] | str,
    ts_col: str,
    delta: float | None = None,
    tiebreak: str | None = None,
) -> DataFrame:
    """Closure nearest-neighbor join of two event streams/tables.

    Parameters
    ----------
    df_r, df_s : inputs; must both contain ``keys`` and ``ts_col``. ``ts_col``
        may be TimestampType or numeric (epoch seconds).
    keys : equality join key column(s) — the per-series identity (the
        reference's ``thing.quantity`` Kafka key, simulatorToKafka.py:66).
    delta : optional max |t_r - t_s| in seconds (reference's delta_time band,
        local_stream_buffer.py:117-118). None = unbounded.
    tiebreak : optional column name present in both inputs used to total-order
        records with equal (ts, side); defaults to ts-only ordering (ties
        between sides order R before S).

    Returns columns: keys + ``r_<col>`` for every non-key column of df_r +
    ``s_<col>`` for every non-key column of df_s.
    """
    if isinstance(keys, str):
        keys = [keys]
    r_payload = [c for c in df_r.columns if c not in keys]
    s_payload = [c for c in df_s.columns if c not in keys]

    # build the NULL-struct literal types from the input schemas directly:
    # a df.select(F.struct(...)).schema probe costs a full analysis
    # round-trip per side on the driver (~0.1 s each on deep inputs),
    # paid at every plan construction
    from pyspark.sql.types import StructType

    r_struct_t = StructType([df_r.schema[c] for c in r_payload])
    s_struct_t = StructType([df_s.schema[c] for c in s_payload])

    merged = df_r.select(
        *keys,
        F.col(ts_col).alias("__ts"),
        F.lit(0).alias("__side"),
        F.struct(*[F.col(c) for c in r_payload]).alias("__rp"),
        F.lit(None).cast(s_struct_t).alias("__sp"),
    ).unionByName(
        df_s.select(
            *keys,
            F.col(ts_col).alias("__ts"),
            F.lit(1).alias("__side"),
            F.lit(None).cast(r_struct_t).alias("__rp"),
            F.struct(*[F.col(c) for c in s_payload]).alias("__sp"),
        )
    )

    if tiebreak is None:
        # Fast path (optimization round 7): the annotation windows and
        # pair expressions are built as SQL strings — ONE parse RPC per
        # select instead of ~870 per-Column py4j round-trips (measured
        # 0.32 s → 0.12 s per plan construction, paid on every timed
        # pass). Same logical expressions, same physical plan (the
        # existing 1-exchange / 2-sort plan guard pins it); output
        # verified row-identical to the Column form and to the closure
        # kernel. The Column path below remains for the tiebreak form.
        pairs = _nn_pairs_sql(merged, keys)
        return _nn_project_out(
            pairs, keys, ts_col, r_payload, s_payload, df_r, delta
        )

    # Same-side same-ts rows are ordered by the tiebreak column if given,
    # else by the payload struct — any deterministic total order works; the
    # cross-side comparisons below are ts-INCLUSIVE (the kernel's
    # searchsorted semantics: an equal-ts other-side row is "at-or-after"
    # AND "at-or-before"), matching closure_pairs and the reference's
    # `s_j.time >= r_t0.time` joins (local_stream_buffer.py:302-306).
    if tiebreak is not None:
        merged = merged.withColumn(
            "__tb", F.coalesce(F.col(f"__rp.{tiebreak}"), F.col(f"__sp.{tiebreak}"))
        )

    def side_struct(payload_col: str) -> Column:
        fields = [F.col("__ts").alias("t")]
        if tiebreak is not None:
            fields.append(F.col("__tb").alias("tb"))
        fields.append(F.col(payload_col).alias("p"))
        return F.struct(*fields)

    # ts-only ordering so RANGE frames treat all equal-ts rows (either
    # side) as peers of the current row — inclusive nearest lookups.
    # Both frames end at CURRENT ROW (one asc, one desc): Spark evaluates
    # unbounded-preceding frames incrementally (O(n) per key); a frame
    # extending to unboundedFollowing would re-aggregate per row (O(n²))
    w_before = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__ts").asc())
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_after = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__ts").desc())
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # total order for same-side neighbor lookups (group-position tests);
    # the asc sort also satisfies w_before's ts-prefix requirement
    rows_order = [F.col("__ts"), F.col("__side")]
    if tiebreak is not None:
        rows_order.append(F.col("__tb"))
    rows_order += [F.col("__rp"), F.col("__sp")]
    w_rows_before = (
        Window.partitionBy(*keys)
        .orderBy(*[c.asc() for c in rows_order])
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_rows_after = (
        Window.partitionBy(*keys)
        .orderBy(*[c.desc() for c in rows_order])
        .rowsBetween(Window.unboundedPreceding, -1)
    )

    is_r = F.col("__side") == 0
    self_r = side_struct("__rp")
    self_s = side_struct("__sp")

    # Two chained selects per sort direction: the rows-frame window sorts by
    # the FULL total order and the range-frame window then only requires its
    # (ts) prefix — Spark's sort-order satisfaction elides the extra sort,
    # so the whole operator is one exchange + two sorts (asc + desc).
    ann = merged.select(
        "*",
        # same-side strict neighbors (dedup predicates only need their ts)
        F.last(F.when(is_r, F.col("__ts")), ignorenulls=True)
        .over(w_rows_before)
        .alias("__psame_r_t"),
        F.last(F.when(~is_r, F.col("__ts")), ignorenulls=True)
        .over(w_rows_before)
        .alias("__psame_s_t"),
    ).select(
        "*",
        # nearest other-side rows at-or-before, ts-inclusive (RANGE peers);
        # max of (t, [tb], p) structs = latest with a deterministic order
        F.max(F.when(is_r, self_r)).over(w_before).alias("__prev_r"),
        F.max(F.when(~is_r, self_s)).over(w_before).alias("__prev_s"),
    ).select(
        "*",
        # strict same-side successor = last same-side row seen in the
        # REVERSED total order before the current row (running frame)
        F.last(F.when(is_r, F.col("__ts")), ignorenulls=True)
        .over(w_rows_after)
        .alias("__nsame_r_t"),
        F.last(F.when(~is_r, F.col("__ts")), ignorenulls=True)
        .over(w_rows_after)
        .alias("__nsame_s_t"),
    ).select(
        "*",
        F.min(F.when(is_r, self_r)).over(w_after).alias("__next_r"),
        F.min(F.when(~is_r, self_s)).over(w_after).alias("__next_s"),
    )

    prev_other = F.when(is_r, F.col("__prev_s")).otherwise(F.col("__prev_r"))
    next_other = F.when(is_r, F.col("__next_s")).otherwise(F.col("__next_r"))
    prev_same_t = F.when(is_r, F.col("__psame_r_t")).otherwise(F.col("__psame_s_t"))
    next_same_t = F.when(is_r, F.col("__nsame_r_t")).otherwise(F.col("__nsame_s_t"))
    fo_t = F.when(is_r, F.col("__next_s.t")).otherwise(F.col("__next_r.t"))
    lo_t = F.when(is_r, F.col("__prev_s.t")).otherwise(F.col("__prev_r.t"))

    # pair struct normalized so the R-side record is always left (reference's
    # role normalization, local_stream_buffer.py:369-376)
    def pair(r_t: Column, r_p: Column, s_t: Column, s_p: Column) -> Column:
        return F.struct(
            r_t.alias("r_t"), r_p.alias("r_p"), s_t.alias("s_t"), s_p.alias("s_p")
        )

    # Construction-based dedup (no extra shuffle): the emitted bag equals
    # the kernel's SET of pairs. Derivation (each pair-equality case):
    #  * two alphas collide only at mutual-first ties — the S row skips;
    #  * beta(e) == alpha(LO(e)) iff e is the first own-side row at-or-after
    #    LO(e), i.e. prevSame(e) is absent or strictly before LO(e);
    #  * beta(e) == alpha(e) iff FO(e) == LO(e) (single equal-ts partner);
    #  * two betas collide only at mutual-last ties — the S row skips.
    first_in_group = prev_same_t.isNull() | (prev_same_t < F.col("__ts"))
    last_in_group = next_same_t.isNull() | (next_same_t > F.col("__ts"))
    dup_self = F.when(
        is_r, F.col("__next_s").eqNullSafe(F.col("__prev_s"))
    ).otherwise(F.col("__next_r").eqNullSafe(F.col("__prev_r")))

    # alpha: (self, earliest other-side at-or-after self)
    alpha = F.when(
        next_other.isNotNull()
        & (is_r | ~((fo_t == F.col("__ts")) & first_in_group)),
        F.when(
            is_r,
            pair(F.col("__ts"), F.col("__rp"), next_other["t"], next_other["p"]),
        ).otherwise(
            pair(next_other["t"], next_other["p"], F.col("__ts"), F.col("__sp"))
        ),
    )
    # beta: (latest other-side at-or-before self, self), confirmed by the
    # existence of a forward other-side partner, minus the dedup skips above
    beta = F.when(
        prev_other.isNotNull()
        & next_other.isNotNull()
        & prev_same_t.isNotNull()
        & (prev_same_t >= lo_t)
        & ~dup_self
        & ~(~is_r & (lo_t == F.col("__ts")) & last_in_group),
        F.when(
            is_r,
            pair(F.col("__ts"), F.col("__rp"), prev_other["t"], prev_other["p"]),
        ).otherwise(
            pair(prev_other["t"], prev_other["p"], F.col("__ts"), F.col("__sp"))
        ),
    )

    pairs = ann.select(
        *keys,
        F.explode(
            F.array_compact(F.array(alpha, beta))
        ).alias("__pair"),
    )
    return _nn_project_out(pairs, keys, ts_col, r_payload, s_payload, df_r, delta)


_PLAIN_IDENT = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")


def nn_join_one_source(
    df: DataFrame,
    keys: list[str] | str,
    ts_col: str,
    side_col: str,
    left_value: str,
    right_value: str,
    delta: float | None = None,
) -> DataFrame:
    """``nn_join`` for the one-topic case: both sides live in ONE table,
    tagged by ``side_col`` (the reference's single Kafka topic carrying
    both quantities, keyed by ``thing.quantity``).

    Exactly equivalent to::

        r = df.filter(col(side_col) == left_value).drop(side_col)
        s = df.filter(col(side_col) == right_value).drop(side_col)
        nn_join(r, s, keys, ts_col, delta)

    (equality-tested) but builds the merged two-sided stream with a
    single CASE-tagged pass instead of unioning two filtered scans — the
    source is read ONCE instead of twice (guide §1.2: remove unnecessary
    passes; at cluster scale the second scan is a full extra read of the
    input). Rows with any other ``side_col`` value are dropped, as the
    two-filter form drops them."""
    if isinstance(keys, str):
        keys = [keys]
    payload = [c for c in df.columns if c not in keys and c != side_col]
    ident_ok = all(
        _PLAIN_IDENT.match(c) for c in [*keys, ts_col, side_col, *payload]
    ) and "'" not in f"{left_value}{right_value}"
    if not ident_ok:  # pragma: no cover - defensive fallback
        r = df.filter(F.col(side_col) == left_value).drop(side_col)
        s = df.filter(F.col(side_col) == right_value).drop(side_col)
        return nn_join(r, s, keys, ts_col, delta)
    pstruct = "struct(" + ", ".join(f"`{c}` AS `{c}`" for c in payload) + ")"
    merged = df.filter(
        F.col(side_col).isin(left_value, right_value)
    ).selectExpr(
        *[f"`{k}`" for k in keys],
        f"`{ts_col}` AS __ts",
        f"CAST(`{side_col}` = '{right_value}' AS INT) AS __side",
        f"CASE WHEN `{side_col}` = '{left_value}' THEN {pstruct} END AS __rp",
        f"CASE WHEN `{side_col}` = '{right_value}' THEN {pstruct} END AS __sp",
    )
    pairs = _nn_pairs_sql(merged, keys)
    return _nn_project_out(
        pairs, keys, ts_col, payload, payload, df, delta
    )


def _nn_project_out(
    pairs: DataFrame,
    keys: list[str],
    ts_col: str,
    r_payload: list[str],
    s_payload: list[str],
    df_r: DataFrame,
    delta: float | None,
) -> DataFrame:
    """Shared tail: optional Δ-band filter + r_/s_-prefixed projection."""
    names = [*keys, ts_col, *r_payload, *s_payload]
    if all(_PLAIN_IDENT.match(c) for c in names):
        # SQL-string fast path: one parse RPC per select/filter instead of
        # ~2 py4j round-trips per output column (see _nn_pairs_sql)
        if delta is not None:
            ts_type = df_r.schema[ts_col].dataType.simpleString()
            if ts_type.startswith("timestamp"):
                dt = (
                    "CAST(CAST(__pair.r_t AS TIMESTAMP) AS DOUBLE) - "
                    "CAST(CAST(__pair.s_t AS TIMESTAMP) AS DOUBLE)"
                )
            else:
                dt = "CAST(__pair.r_t AS DOUBLE) - CAST(__pair.s_t AS DOUBLE)"
            pairs = pairs.filter(
                f"abs({dt}) <= CAST({float(delta)!r} AS DOUBLE)"
            )
        return pairs.selectExpr(
            *[f"`{k}`" for k in keys],
            f"__pair.r_t AS `{PAIR_LEFT_PREFIX}{ts_col}`",
            *[
                f"__pair.r_p.`{c}` AS `{PAIR_LEFT_PREFIX}{c}`"
                for c in r_payload
                if c != ts_col
            ],
            f"__pair.s_t AS `{PAIR_RIGHT_PREFIX}{ts_col}`",
            *[
                f"__pair.s_p.`{c}` AS `{PAIR_RIGHT_PREFIX}{c}`"
                for c in s_payload
                if c != ts_col
            ],
        )
    if delta is not None:
        ts_type = df_r.schema[ts_col].dataType.simpleString()
        if ts_type.startswith("timestamp"):
            # TIMESTAMP_NTZ has no direct double cast; go via TIMESTAMP (UTC session)
            def secs(c: Column) -> Column:
                return c.cast("timestamp").cast("double")
        else:
            def secs(c: Column) -> Column:
                return c.cast("double")

        dt = secs(F.col("__pair.r_t")) - secs(F.col("__pair.s_t"))
        pairs = pairs.filter(F.abs(dt) <= F.lit(float(delta)))

    out_cols = (
        [F.col(k) for k in keys]
        + [F.col("__pair.r_t").alias(f"{PAIR_LEFT_PREFIX}{ts_col}")]
        + [
            F.col(f"__pair.r_p.{c}").alias(f"{PAIR_LEFT_PREFIX}{c}")
            for c in r_payload
            if c != ts_col
        ]
        + [F.col("__pair.s_t").alias(f"{PAIR_RIGHT_PREFIX}{ts_col}")]
        + [
            F.col(f"__pair.s_p.{c}").alias(f"{PAIR_RIGHT_PREFIX}{c}")
            for c in s_payload
            if c != ts_col
        ]
    )
    return pairs.select(*out_cols)


def _nn_pairs_sql(merged: DataFrame, keys: list[str]) -> DataFrame:
    """SQL-string form of the annotation windows + alpha/beta pair
    emission — the same logical expressions as the Column form in
    :func:`nn_join` (ts-only tiebreak), parsed JVM-side in five selects
    instead of hundreds of per-Column py4j round-trips. Every predicate
    mirrors the Column path one-to-one (see the derivation comments
    there); `<=>` is eqNullSafe, `last(x, true)` ignores nulls."""
    kq = ", ".join(f"`{k}`" for k in keys)
    rows_b = (
        f"OVER (PARTITION BY {kq} ORDER BY __ts ASC, __side ASC, __rp ASC, "
        "__sp ASC ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)"
    )
    rows_a = (
        f"OVER (PARTITION BY {kq} ORDER BY __ts DESC, __side DESC, __rp DESC, "
        "__sp DESC ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)"
    )
    rng_b = (
        f"OVER (PARTITION BY {kq} ORDER BY __ts ASC "
        "RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
    )
    rng_a = (
        f"OVER (PARTITION BY {kq} ORDER BY __ts DESC "
        "RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
    )
    sr = "struct(__ts AS t, __rp AS p)"
    ss = "struct(__ts AS t, __sp AS p)"
    # all eight annotation windows in ONE select: every window reads only
    # base columns (none consumes another's output), the analyzer's
    # ExtractWindowExpressions still groups them into the same four Window
    # operators over two sort orders (verified: executed plan keeps the
    # pinned 1-Exchange / 2-Sort / 4-Window shape), and one select means
    # one parse RPC + one analysis pass instead of four of each
    ann = merged.selectExpr(
        "*",
        f"last(CASE WHEN __side = 0 THEN __ts END, true) {rows_b} AS __psame_r_t",
        f"last(CASE WHEN __side = 1 THEN __ts END, true) {rows_b} AS __psame_s_t",
        f"max(CASE WHEN __side = 0 THEN {sr} END) {rng_b} AS __prev_r",
        f"max(CASE WHEN __side = 1 THEN {ss} END) {rng_b} AS __prev_s",
        f"last(CASE WHEN __side = 0 THEN __ts END, true) {rows_a} AS __nsame_r_t",
        f"last(CASE WHEN __side = 1 THEN __ts END, true) {rows_a} AS __nsame_s_t",
        f"min(CASE WHEN __side = 0 THEN {sr} END) {rng_a} AS __next_r",
        f"min(CASE WHEN __side = 1 THEN {ss} END) {rng_a} AS __next_s",
    )
    prev_other = "(CASE WHEN __side = 0 THEN __prev_s ELSE __prev_r END)"
    next_other = "(CASE WHEN __side = 0 THEN __next_s ELSE __next_r END)"
    prev_same_t = "(CASE WHEN __side = 0 THEN __psame_r_t ELSE __psame_s_t END)"
    next_same_t = "(CASE WHEN __side = 0 THEN __nsame_r_t ELSE __nsame_s_t END)"
    fo_t = "(CASE WHEN __side = 0 THEN __next_s.t ELSE __next_r.t END)"
    lo_t = "(CASE WHEN __side = 0 THEN __prev_s.t ELSE __prev_r.t END)"
    first_in_group = f"({prev_same_t} IS NULL OR {prev_same_t} < __ts)"
    last_in_group = f"({next_same_t} IS NULL OR {next_same_t} > __ts)"
    dup_self = (
        "(CASE WHEN __side = 0 THEN __next_s <=> __prev_s "
        "ELSE __next_r <=> __prev_r END)"
    )

    def pair(r_t: str, r_p: str, s_t: str, s_p: str) -> str:
        return f"struct({r_t} AS r_t, {r_p} AS r_p, {s_t} AS s_t, {s_p} AS s_p)"

    pair_alpha = (
        f"CASE WHEN __side = 0 "
        f"THEN {pair('__ts', '__rp', next_other + '.t', next_other + '.p')} "
        f"ELSE {pair(next_other + '.t', next_other + '.p', '__ts', '__sp')} END"
    )
    pair_beta = (
        f"CASE WHEN __side = 0 "
        f"THEN {pair('__ts', '__rp', prev_other + '.t', prev_other + '.p')} "
        f"ELSE {pair(prev_other + '.t', prev_other + '.p', '__ts', '__sp')} END"
    )
    alpha = (
        f"CASE WHEN {next_other} IS NOT NULL "
        f"AND (__side = 0 OR NOT (({fo_t} = __ts) AND {first_in_group})) "
        f"THEN {pair_alpha} END"
    )
    beta = (
        f"CASE WHEN {prev_other} IS NOT NULL AND {next_other} IS NOT NULL "
        f"AND {prev_same_t} IS NOT NULL AND ({prev_same_t} >= {lo_t}) "
        f"AND NOT {dup_self} "
        f"AND NOT ((__side = 1) AND ({lo_t} = __ts) AND {last_in_group}) "
        f"THEN {pair_beta} END"
    )
    return ann.selectExpr(
        *[f"`{k}`" for k in keys],
        f"explode(array_compact(array({alpha}, {beta}))) AS __pair",
    )


def nn_join_banded(
    df_r: DataFrame,
    df_s: DataFrame,
    keys: list[str] | str,
    ts_col: str,
    delta: float,
    chunk_seconds: float | None = None,
) -> DataFrame:
    """Closure join with *intra-key* parallelism — the hot-series scale path.

    ``nn_join`` puts each key's timeline on one task; a single pathological
    series (one domain dominating a crawl) then bounds the stage. For
    Δ-banded joins this variant shards each key's timeline into
    ``chunk_seconds``-wide buckets (must be ≥ delta; default = delta) and
    computes the closure per (key, bucket) with ±1-bucket overlap rows:

    * any record strictly between a row and its candidate partner lies
      within Δ ≤ chunk of that row, hence inside the bucket ∪ overlap — so
      nearest-neighbor identities are exact for every emitted (|dt| ≤ Δ)
      pair, and pairs wider than Δ are filtered regardless;
    * the beta lookahead ("some other-side record at-or-after y exists")
      is unbounded-range, so it is checked against a per-key global
      other-side max computed by a tiny pre-aggregation (broadcast);
    * each pair is emitted only by its generating row's own bucket, so
      overlap duplication never duplicates output.

    Output and semantics are identical to ``nn_join(..., delta=delta)``
    (property-tested); the plan trades 3× row duplication for
    #buckets-way parallelism inside each key.
    """
    if isinstance(keys, str):
        keys = [keys]
    if delta is None or delta <= 0:
        raise ValueError("nn_join_banded requires a positive delta band")
    width = float(chunk_seconds or delta)
    if width < delta:
        raise ValueError("chunk_seconds must be >= delta")

    r_payload = [c for c in df_r.columns if c not in keys]
    s_payload = [c for c in df_s.columns if c not in keys]

    def secs(c: Column) -> Column:
        return c.cast("timestamp").cast("double") if str(
            df_r.schema[ts_col].dataType
        ).lower().startswith("timestamp") else c.cast("double")

    def tag(df: DataFrame, side: int, own_struct, other_struct_type) -> DataFrame:
        payload = [c for c in df.columns if c not in keys]
        base = df.select(
            *keys,
            F.col(ts_col).alias("__ts"),
            F.lit(side).alias("__side"),
            *( [F.struct(*[F.col(c) for c in payload]).alias("__rp"),
                F.lit(None).cast(other_struct_type).alias("__sp")]
               if side == 0 else
               [F.lit(None).cast(own_struct).alias("__rp"),
                F.struct(*[F.col(c) for c in payload]).alias("__sp")] ),
        )
        bucket = F.floor(secs(F.col("__ts")) / F.lit(width)).cast("long")
        return base.select(
            "*",
            bucket.alias("__own_bucket"),
            F.explode(
                F.array(bucket - 1, bucket, bucket + 1)
            ).alias("__bucket"),
        )

    from pyspark.sql.types import StructType

    # local struct types — no per-side analysis round-trip (see nn_join)
    r_struct_t = StructType([df_r.schema[c] for c in r_payload])
    s_struct_t = StructType([df_s.schema[c] for c in s_payload])

    merged = tag(df_r, 0, r_struct_t, s_struct_t).unionByName(
        tag(df_s, 1, r_struct_t, s_struct_t)
    )
    is_own = F.col("__bucket") == F.col("__own_bucket")

    # per-key global other-side max (the unbounded beta lookahead)
    maxes = (
        merged.filter(is_own)
        .groupBy(*keys)
        .agg(
            F.max(F.when(F.col("__side") == 0, F.col("__ts"))).alias("__max_r"),
            F.max(F.when(F.col("__side") == 1, F.col("__ts"))).alias("__max_s"),
        )
    )

    part = [*keys, "__bucket"]
    # same inclusive-tie semantics as nn_join (see its dedup derivation):
    # ts-only RANGE frames for the cross-side nearest lookups, a rows-frame
    # total order for the same-side group-position predicates
    # O(n) running frames only — see nn_join: asc/desc unbounded-preceding
    # range frames for the inclusive cross-side lookups, reversed rows
    # frames for the same-side group-position predicates
    w_before = Window.partitionBy(*part).orderBy(F.col("__ts").asc()).rangeBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_after = Window.partitionBy(*part).orderBy(F.col("__ts").desc()).rangeBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    rows_order = [
        F.col("__ts"), F.col("__side"), F.col("__rp"), F.col("__sp"),
    ]
    w_rows_before = Window.partitionBy(*part).orderBy(
        *[c.asc() for c in rows_order]
    ).rowsBetween(Window.unboundedPreceding, -1)
    w_rows_after = Window.partitionBy(*part).orderBy(
        *[c.desc() for c in rows_order]
    ).rowsBetween(Window.unboundedPreceding, -1)

    is_r = F.col("__side") == 0
    self_r = F.struct(F.col("__ts").alias("t"), F.col("__rp").alias("p"))
    self_s = F.struct(F.col("__ts").alias("t"), F.col("__sp").alias("p"))
    # chained selects per sort direction — range windows ride the rows
    # windows' sort via prefix satisfaction (see nn_join)
    ann = merged.select(
        *keys, "__ts", "__side", "__rp", "__sp", "__bucket", "__own_bucket",
        F.last(F.when(is_r, F.col("__ts")), ignorenulls=True)
        .over(w_rows_before).alias("__psame_r_t"),
        F.last(F.when(~is_r, F.col("__ts")), ignorenulls=True)
        .over(w_rows_before).alias("__psame_s_t"),
    ).select(
        "*",
        F.max(F.when(is_r, self_r)).over(w_before).alias("__prev_r"),
        F.max(F.when(~is_r, self_s)).over(w_before).alias("__prev_s"),
    ).select(
        "*",
        F.last(F.when(is_r, F.col("__ts")), ignorenulls=True)
        .over(w_rows_after).alias("__nsame_r_t"),
        F.last(F.when(~is_r, F.col("__ts")), ignorenulls=True)
        .over(w_rows_after).alias("__nsame_s_t"),
    ).select(
        "*",
        F.min(F.when(is_r, self_r)).over(w_after).alias("__next_r"),
        F.min(F.when(~is_r, self_s)).over(w_after).alias("__next_s"),
    ).join(F.broadcast(maxes), keys)

    prev_other = F.when(is_r, F.col("__prev_s")).otherwise(F.col("__prev_r"))
    next_other = F.when(is_r, F.col("__next_s")).otherwise(F.col("__next_r"))
    other_max = F.when(is_r, F.col("__max_s")).otherwise(F.col("__max_r"))
    prev_same_t = F.when(is_r, F.col("__psame_r_t")).otherwise(F.col("__psame_s_t"))
    next_same_t = F.when(is_r, F.col("__nsame_r_t")).otherwise(F.col("__nsame_s_t"))
    fo_t = F.when(is_r, F.col("__next_s.t")).otherwise(F.col("__next_r.t"))
    lo_t = F.when(is_r, F.col("__prev_s.t")).otherwise(F.col("__prev_r.t"))
    first_in_group = prev_same_t.isNull() | (prev_same_t < F.col("__ts"))
    last_in_group = next_same_t.isNull() | (next_same_t > F.col("__ts"))
    # ties are at distance 0, hence always bucket-local: the local FO/LO
    # are exact wherever these tie predicates can fire
    dup_self = F.when(
        is_r, F.col("__next_s").eqNullSafe(F.col("__prev_s"))
    ).otherwise(F.col("__next_r").eqNullSafe(F.col("__prev_r")))

    def pair(r_t, r_p, s_t, s_p):
        return F.struct(
            r_t.alias("r_t"), r_p.alias("r_p"), s_t.alias("s_t"), s_p.alias("s_p")
        )

    in_band = lambda a, b: F.abs(secs(a) - secs(b)) <= F.lit(delta)  # noqa: E731
    alpha = F.when(
        is_own
        & next_other.isNotNull()
        & in_band(F.col("__ts"), next_other["t"])
        & (is_r | ~((fo_t == F.col("__ts")) & first_in_group)),
        F.when(
            is_r, pair(F.col("__ts"), F.col("__rp"), next_other["t"], next_other["p"])
        ).otherwise(
            pair(next_other["t"], next_other["p"], F.col("__ts"), F.col("__sp"))
        ),
    )
    beta = F.when(
        is_own
        & prev_other.isNotNull()
        & in_band(F.col("__ts"), prev_other["t"])
        & prev_same_t.isNotNull()
        & (prev_same_t >= lo_t)
        & ~dup_self
        & ~(~is_r & (lo_t == F.col("__ts")) & last_in_group)
        & other_max.isNotNull()
        & (other_max >= F.col("__ts")),
        F.when(
            is_r, pair(F.col("__ts"), F.col("__rp"), prev_other["t"], prev_other["p"])
        ).otherwise(
            pair(prev_other["t"], prev_other["p"], F.col("__ts"), F.col("__sp"))
        ),
    )
    pairs = ann.select(
        *keys,
        F.explode(F.array_compact(F.array(alpha, beta))).alias(
            "__pair"
        ),
    )
    out_cols = (
        [F.col(k) for k in keys]
        + [F.col("__pair.r_t").alias(f"{PAIR_LEFT_PREFIX}{ts_col}")]
        + [F.col(f"__pair.r_p.{c}").alias(f"{PAIR_LEFT_PREFIX}{c}")
           for c in r_payload if c != ts_col]
        + [F.col("__pair.s_t").alias(f"{PAIR_RIGHT_PREFIX}{ts_col}")]
        + [F.col(f"__pair.s_p.{c}").alias(f"{PAIR_RIGHT_PREFIX}{c}")
           for c in s_payload if c != ts_col]
    )
    return pairs.select(*out_cols)
