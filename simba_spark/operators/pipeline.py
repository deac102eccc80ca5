"""Training-data pipeline utilities: reproducible sampling, per-group
quotas, and sequence packing (north-star §2.7 extensions — the ops a
100 TB corpus build runs between dedup and tokenization).

All three are pure Column/window programs (zero Python in the data
path) and deterministic by construction, so a DuckDB oracle can
reproduce them bit-for-bit — sampling decisions derive from md5, never
from an RNG whose stream depends on partitioning.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: md5-derived uniform in [0, 1): top 13 hex chars (52 bits — exactly a
#: double's mantissa, so the division is lossless in both engines)
_UNIT = float(1 << 52)


def _unit_hash(col, seed: int):
    h = F.md5(F.concat(F.col(col).cast("string"), F.lit(f"#{seed}")))
    return F.conv(F.substring(h, 1, 13), 16, 10).cast("double") / F.lit(_UNIT)


def unit_hash_sql(expr: str, seed: int) -> str:
    """DuckDB SQL mirror of the sampling hash."""
    return (
        f"(('0x' || substr(md5(({expr}) || '#{seed}'), 1, 13))::BIGINT"
        f" / {_UNIT:.1f})"
    )


def hash_sample(
    df: DataFrame, key_col: str, rate: float, seed: int = 42
) -> DataFrame:
    """Deterministic ~`rate` sample: keep rows whose md5-derived uniform
    is < rate. Unlike ``df.sample()``, membership depends only on the
    key — stable across partitioning, re-runs, engines, and cluster
    sizes, so a subset is reproducible and two tables sampled on the
    same key stay aligned. Zero shuffle."""
    assert 0.0 <= rate <= 1.0
    return df.filter(_unit_hash(key_col, seed) < F.lit(float(rate)))


def split_assign(
    df: DataFrame,
    key_col: str,
    splits: Sequence[Tuple[str, float]] = (
        ("train", 0.9), ("val", 0.05), ("test", 0.05)),
    seed: int = 42,
    out_col: str = "split",
) -> DataFrame:
    """Deterministic, leakage-safe train/val/test assignment: every row
    sharing ``key_col`` lands in the SAME split (the key's md5 uniform
    falls in exactly one cumulative-fraction interval), so passing a
    GROUP id — an exact-dup fingerprint, a dedup
    connected-component id (:func:`..dedup.connected_components`), a
    domain — guarantees no near-duplicate pair ever straddles
    train/test. Per-row i.i.d. splitting (``df.randomSplit``) cannot
    make that guarantee, and it also reshuffles on every run; this is
    zero-shuffle, whole-stage codegen, and stable across partitioning,
    re-runs, engines, and cluster sizes (same :func:`_unit_hash` as
    the sampling family). NULL keys get a NULL split (no deterministic
    group).

    ``splits`` is an ordered (name, fraction) sequence; fractions must
    be positive and sum to 1 (the last split takes the remaining
    interval, so the fp-edge u ≈ 1 case is covered).
    """
    names = [str(n) for n, _ in splits]
    fracs = [float(f) for _, f in splits]
    if len(names) != len(set(names)):
        raise ValueError(f"duplicate split names: {names}")
    if any(f <= 0 for f in fracs):
        raise ValueError(f"split fractions must be positive: {fracs}")
    if abs(sum(fracs) - 1.0) > 1e-9:
        raise ValueError(f"split fractions must sum to 1: {sum(fracs)}")
    u = _unit_hash(key_col, seed)
    expr = F.lit(names[-1])
    cum = 0.0
    arms = []
    for name, frac in zip(names[:-1], fracs[:-1]):
        cum += frac
        arms.append((name, cum))
    for name, bound in reversed(arms):
        expr = F.when(u < F.lit(bound), F.lit(name)).otherwise(expr)
    expr = F.when(F.col(key_col).isNull(), F.lit(None).cast("string")) \
        .otherwise(expr)
    return df.withColumn(out_col, expr)


def split_assign_sql(
    key_expr: str,
    splits: Sequence[Tuple[str, float]] = (
        ("train", 0.9), ("val", 0.05), ("test", 0.05)),
    seed: int = 42,
) -> str:
    """DuckDB SQL mirror of :func:`split_assign`'s assignment
    expression (same md5 uniform, same cumulative boundaries — the
    literal doubles are identical, so membership matches
    bit-for-bit)."""
    u = unit_hash_sql(key_expr, seed)
    names = [str(n) for n, _ in splits]
    fracs = [float(f) for _, f in splits]
    whens = []
    cum = 0.0
    for name, frac in zip(names[:-1], fracs[:-1]):
        cum += frac
        whens.append(f"WHEN {u} < {cum!r} THEN '{name}'")
    body = " ".join(whens)
    return (f"CASE WHEN ({key_expr}) IS NULL THEN NULL "
            f"{body} ELSE '{names[-1]}' END")


def table_diff(
    left: DataFrame,
    right: DataFrame,
    key_cols: Sequence[str],
    compare_cols: Optional[Sequence[str]] = None,
    status_col: str = "diff_status",
    changed_col: str = "changed_cols",
) -> DataFrame:
    """Snapshot reconciliation: one row per key with its change status
    between two table versions — 'added' (right only), 'removed'
    (left only), 'changed' (both sides, any compare column differs,
    null-safe), 'unchanged' — plus the sorted list of differing
    column names for 'changed' rows (empty array otherwise). The
    data-migration / CDC-validation primitive: diff a rewritten table
    against its source without materializing either twice.

    ONE full-outer shuffle join on the keys (both sides pre-projected
    to keys + compare columns, so the shuffle carries only compared
    data); per-column null-safe equality and the status CASE are
    codegen expressions. Keys must be non-null and UNIQUE per side —
    'one row per key' is the contract, and duplicate keys would fan
    the outer join out to m×n contradictory rows — both enforced with
    distributed raise_errors (no driver job; the uniqueness count
    window hashes on the keys, the same partitioning the join needs
    anyway). ``compare_cols`` defaults to the non-key columns present
    on BOTH sides.
    """
    keys = list(key_cols)
    if compare_cols is None:
        compare_cols = [c for c in left.columns
                        if c not in keys and c in right.columns]
    cmps = list(compare_cols)
    for c in ("__l_present", "__r_present"):
        if c in left.columns or c in right.columns:
            raise ValueError(f"reserved column name {c!r} in input")

    def _guarded(df, side, payload):
        # both guards live INSIDE the key expression — a side-channel
        # column would be pruned as dead code before it could raise
        dup = F.count(F.lit(1)).over(Window.partitionBy(*keys))
        dtypes = dict(df.dtypes)

        def gkey(kc):
            return F.when(
                F.col(kc).isNull(),
                F.raise_error(F.lit(
                    f"table_diff: NULL {kc} on {side} side "
                    f"(keys must be non-null)")).cast(dtypes[kc]),
            ).when(
                dup > 1,
                F.raise_error(F.concat(
                    F.lit(f"table_diff: duplicate key on {side} side: "),
                    F.col(kc).cast("string"))).cast(dtypes[kc]),
            ).otherwise(F.col(kc)).alias(kc)

        return df.select(*[gkey(k) for k in keys], *payload)

    l = _guarded(left, "left",
                 [*cmps, F.lit(1).alias("__l_present")])
    r = _guarded(right, "right",
                 [*[F.col(c).alias(f"__r_{c}") for c in cmps],
                  F.lit(1).alias("__r_present")])
    j = l.join(r, on=keys, how="full_outer")
    diffs = F.filter(
        F.array(*[
            F.when(~F.col(c).eqNullSafe(F.col(f"__r_{c}")), F.lit(c))
            for c in sorted(cmps)
        ]),
        lambda x: x.isNotNull(),
    ) if cmps else F.array().cast("array<string>")
    status = (
        F.when(F.col("__r_present").isNull(), F.lit("removed"))
        .when(F.col("__l_present").isNull(), F.lit("added"))
        .when(F.size(diffs) > 0, F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return (
        j.withColumn(status_col, status)
        .withColumn(
            changed_col,
            F.when(F.col(status_col) == "changed", diffs)
            .otherwise(F.array().cast("array<string>")),
        )
        .select(*keys, status_col, changed_col)
    )


def table_diff_sql(
    left_sql: str,
    right_sql: str,
    key_cols: Sequence[str],
    compare_cols: Sequence[str],
    status_col: str = "diff_status",
    changed_col: str = "changed_cols",
) -> str:
    """DuckDB mirror of :func:`table_diff` (explicit compare_cols; the
    same sorted-name change array and status CASE)."""
    keys = list(key_cols)
    cmps = sorted(compare_cols)
    on = " AND ".join(f"l.{k} = r.{k}" for k in keys)
    key_sel = ", ".join(f"coalesce(l.{k}, r.{k}) AS {k}" for k in keys)
    arr = ", ".join(
        f"CASE WHEN l.{c} IS DISTINCT FROM r.{c} THEN '{c}' END"
        for c in cmps)
    diffs = f"list_filter([{arr}], x -> x IS NOT NULL)"
    return f"""
        SELECT {key_sel},
               CASE WHEN r.{keys[0]} IS NULL THEN 'removed'
                    WHEN l.{keys[0]} IS NULL THEN 'added'
                    WHEN len({diffs}) > 0 THEN 'changed'
                    ELSE 'unchanged' END AS {status_col},
               CASE WHEN l.{keys[0]} IS NOT NULL AND r.{keys[0]} IS NOT NULL
                         AND len({diffs}) > 0
                    THEN {diffs} ELSE [] END AS {changed_col}
        FROM ({left_sql}) l FULL JOIN ({right_sql}) r ON {on}
    """


def validate_rows(
    df: DataFrame,
    rules: "dict[str, Column]",
    out_col: str = "failed_rules",
) -> DataFrame:
    """Row-level data-quality validation: ``rules`` maps rule name →
    boolean pass-Column; adds ``out_col`` = the sorted array of FAILED
    rule names (empty = clean row). A NULL rule result counts as a
    FAILURE (`coalesce(pred, false)` — a rule that cannot evaluate did
    not pass), so NULL-blind predicates quarantine instead of leaking.
    Zero shuffle, whole-stage codegen. The dead-letter primitive:
    ``filter(size(out_col) == 0)`` is the clean stream,
    :func:`quarantine` splits both."""
    if not rules:
        raise ValueError("validate_rows: no rules given")
    arr = F.array(*[
        F.when(~F.coalesce(cond, F.lit(False)), F.lit(name))
        for name, cond in sorted(rules.items())
    ])
    return df.withColumn(out_col, F.filter(arr, lambda x: x.isNotNull()))


def quarantine(
    df: DataFrame,
    rules: "dict[str, Column]",
    out_col: str = "failed_rules",
) -> "tuple[DataFrame, DataFrame]":
    """(clean, quarantined) split from :func:`validate_rows`: clean
    rows drop the marker column, quarantined rows keep the failed-rule
    list for the dead-letter sink."""
    v = validate_rows(df, rules, out_col=out_col)
    return (v.filter(F.size(out_col) == 0).drop(out_col),
            v.filter(F.size(out_col) > 0))


def scd2_build(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    attr_cols: Sequence[str],
    tiebreak_col: Optional[str] = None,
    from_col: str = "valid_from",
    to_col: str = "valid_to",
) -> DataFrame:
    """Type-2 slowly-changing-dimension table from an append-only
    history: per key ordered by ``ts_col``, consecutive rows whose
    ``attr_cols`` are unchanged (null-safe) collapse into one version;
    each surviving version gets ``[valid_from, valid_to)`` with the
    open (current) version's ``valid_to`` NULL. The complement of
    :func:`merge_upsert` (SCD1 keep-latest): this keeps the full
    validity timeline, the standard warehouse dimension shape and the
    point-in-time join input (`operators/asof.py` queries it).

    ONE shuffle: both window passes (change detection via null-safe
    lag comparison, then lead over the surviving versions) share the
    same (key, ts) partitioning and sort. Rows with NULL key or ts
    are dropped (no deterministic timeline). ``tiebreak_col`` (a
    column name or a sequence of them) makes the order total when a
    key can repeat a timestamp; with ties left untotaled the result
    would be partitioning-dependent.
    """
    attrs = list(attr_cols)
    if not attrs:
        raise ValueError("scd2_build: attr_cols must be non-empty")
    tbs = ([tiebreak_col] if isinstance(tiebreak_col, str)
           else list(tiebreak_col or []))
    order = [F.col(ts_col).asc()] + [
        F.col(tb).asc() if isinstance(tb, str) else tb for tb in tbs
    ]
    w = Window.partitionBy(key_col).orderBy(*order)
    base = df.filter(F.col(key_col).isNotNull() & F.col(ts_col).isNotNull())
    same = None
    for a in attrs:
        eq = F.col(a).eqNullSafe(F.lag(a).over(w))
        same = eq if same is None else (same & eq)
    first = F.lag(ts_col).over(w).isNull()
    changed = first | ~same
    versions = base.withColumn("__scd_chg", changed).filter("__scd_chg")
    w2 = Window.partitionBy(key_col).orderBy(*order)
    return (
        versions
        .withColumn(from_col, F.col(ts_col))
        .withColumn(to_col, F.lead(ts_col).over(w2))
        .select(key_col, *attrs, from_col, to_col)
    )


def scd2_apply(
    dim: DataFrame,
    changes: DataFrame,
    key_col: str,
    ts_col: str,
    attr_cols: Sequence[str],
    tiebreak_col: Optional[str] = None,
    from_col: str = "valid_from",
    to_col: str = "valid_to",
    delete_col: Optional[str] = None,
) -> DataFrame:
    """INCREMENTAL SCD2 merge: apply a batch of change events to an
    existing :func:`scd2_build` dimension without rebuilding from the
    full history — the production nightly-merge shape. Only the keys
    PRESENT in the batch are touched: untouched keys pass through by
    anti-join (at 100 TB the dominant cost is the batch-key semi/anti
    join, never a rescan of the accumulated history), and each
    affected key's timeline is rebuilt from its VERSION rows (each
    version re-enters as a change event at its ``valid_from``) plus
    the new batch — per-key work is version-count-sized, so late and
    out-of-order arrivals land correctly in the middle of a timeline.

    ``delete_col`` (boolean on ``changes``; NULL = false) adds CDC
    tombstone semantics: a delete event at time T closes the version
    valid at T (its ``valid_to`` becomes T) and opens a GAP — no
    version covers [T, next-event) and a key whose last event is a
    delete has no open version — while a later insert re-opens the
    timeline, even with the same attrs (the delete is a change
    boundary). Mechanically the tombstone rides the same splice as a
    phantom version (attrs nulled, an extra change-detection column)
    and is filtered from the output AFTER the lead() pass stamps its
    start time onto the predecessor's ``valid_to``; point-in-time
    reads (:func:`scd2_lookup`) see the gap naturally.

    Ordering contract: within one timestamp, existing versions sort
    BEFORE batch rows — old versions in their original timeline order
    (``valid_to`` NULLS LAST: a same-ts empty version precedes the
    one that superseded it, the open version last; residual ties
    broken by the attrs, which consecutive-dup collapse guarantees
    distinct), then batch rows by ``tiebreak_col`` — so the result
    equals ``scd2_build`` over the concatenated raw history whenever
    no batch row duplicates an existing version boundary's exact
    timestamp (asserted in tests); consecutive-dup collapse re-runs
    across the splice point, so a batch row that repeats the current
    attrs extends the open version instead of opening a no-op one.
    """
    attrs = list(attr_cols)
    if not attrs:
        raise ValueError("scd2_apply: attr_cols must be non-empty")
    affected = changes.filter(F.col(key_col).isNotNull()) \
        .select(key_col).distinct()
    untouched = dim.join(affected, key_col, "left_anti").select(
        key_col, *attrs, from_col, to_col)
    tb_old = (F.lit(None).cast(dict(changes.dtypes)[tiebreak_col])
              if tiebreak_col else F.lit(0))
    old_events = (
        dim.join(affected, key_col, "left_semi")
        .select(
            key_col, *attrs,
            F.col(from_col).alias(ts_col),
            F.lit(0).alias("__src"),
            F.col(to_col).alias("__vto"),
            tb_old.alias("__tb"),
        )
    )
    dflag = (
        F.coalesce(F.col(delete_col).cast("boolean"), F.lit(False))
        if delete_col is not None else F.lit(False)
    )
    new_events = changes.select(
        key_col,
        *[F.when(~dflag, F.col(a)).alias(a) for a in attrs],
        ts_col,
        F.lit(1).alias("__src"),
        F.lit(None).cast(dict(old_events.dtypes)["__vto"]).alias("__vto"),
        (F.col(tiebreak_col) if tiebreak_col else F.lit(0)).alias("__tb"),
        dflag.cast("int").alias("__del"),
    )
    chg_attrs = attrs + (["__del"] if delete_col is not None else [])
    if delete_col is None:
        new_events = new_events.drop("__del")
    else:
        old_events = old_events.withColumn("__del", F.lit(0))
    rebuilt = scd2_build(
        old_events.unionByName(new_events),
        key_col, ts_col, chg_attrs,
        tiebreak_col=[
            F.col("__src").asc(),
            F.col("__vto").asc_nulls_last(),
            F.col("__tb").asc(),
            *[F.col(a).asc() for a in attrs],
        ],
        from_col=from_col, to_col=to_col,
    )
    if delete_col is not None:
        rebuilt = rebuilt.filter(F.col("__del") == 0).drop("__del")
    return untouched.unionByName(rebuilt)


def scd2_lookup(
    facts: DataFrame,
    dim: DataFrame,
    key_fact: str,
    ts_fact: str,
    key_dim: Optional[str] = None,
    from_col: str = "valid_from",
    to_col: str = "valid_to",
    how: str = "inner",
) -> DataFrame:
    """Point-in-time join: each fact row picks the dimension version
    valid at its timestamp — ``key`` matches and ``valid_from <= ts <
    valid_to`` (NULL ``valid_to`` = open/current version). The reader
    side of :func:`scd2_build`: because a key's validity intervals
    tile time, each fact matches AT MOST one version (exactly one when
    the fact's ts is not before the key's first version; ``how='left'``
    keeps such early facts with NULL attributes).

    Scale: one equi-join on the key (the interval predicates ride as
    join residuals — no row multiplication beyond the per-key version
    count, no window pass over the fact table, unlike the asof_join
    formulation which sorts facts and versions together). AQE sizes
    the shuffle; a broadcast-small dimension skips it entirely.
    """
    key_dim = key_dim or key_fact
    if how not in ("inner", "left"):
        raise ValueError("scd2_lookup: how must be 'inner' or 'left'")
    overlap = (set(facts.columns) & set(dim.columns)) - (
        {key_fact} if key_fact == key_dim else set())
    if overlap:
        raise ValueError(
            f"scd2_lookup: overlapping output columns {sorted(overlap)}"
            " — select/rename the fact or dimension side first")
    f, d = facts.alias("__f"), dim.alias("__d")
    ts = F.col(f"__f.{ts_fact}")
    cond = (
        (F.col(f"__f.{key_fact}") == F.col(f"__d.{key_dim}"))
        & (F.col(f"__d.{from_col}") <= ts)
        & (F.col(f"__d.{to_col}").isNull()
           | (ts < F.col(f"__d.{to_col}")))
    )
    dim_cols = [c for c in dim.columns if c != key_dim]
    return f.join(d, cond, how).select(
        "__f.*", *[F.col(f"__d.{c}") for c in dim_cols])


def merge_upsert(
    target: DataFrame,
    updates: DataFrame,
    key_cols,
    version_col: Optional[str] = None,
    tombstone_col: Optional[str] = None,
    tiebreak_col: Optional[str] = None,
) -> DataFrame:
    """SCD-type-1 merge: rows from `updates` replace same-key rows in
    `target`; unmatched keys pass through; with `version_col`, the
    greatest version wins WITHIN updates (and an older update never
    clobbers a newer target row); with `tombstone_col` (boolean),
    winning tombstone rows DELETE the key from the output.

    One shuffle on the key columns — union + per-key window, the
    standard incremental-batch merge without a table format. (On
    Delta/Iceberg use the native MERGE INTO; this is the plain-parquet
    equivalent with identical semantics.) Both inputs must share a
    schema (plus the optional marker columns on `updates`).

    Determinism: an updates batch carrying several rows for ONE key
    needs an ordering — supply `version_col` (greatest wins) and, for
    version ties, `tiebreak_col` (greatest wins); with neither, ties
    pick an arbitrary row and the result can vary across runs.
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    for h in ("__src", "__rn"):
        if h in target.columns or h in updates.columns:
            raise ValueError(f"reserved column name {h!r} in input")
    t = target.withColumn("__src", F.lit(0))
    u = updates.withColumn("__src", F.lit(1))
    if tombstone_col and tombstone_col not in t.columns:
        t = t.withColumn(tombstone_col, F.lit(False))
    merged = t.unionByName(u, allowMissingColumns=False)
    order = [F.col("__src").desc()]
    if version_col is not None:
        order = [F.col(version_col).desc_nulls_last(), F.col("__src").desc()]
    if tiebreak_col is not None:
        order.append(F.col(tiebreak_col).desc_nulls_last())
    w = Window.partitionBy(*keys).orderBy(*order)
    out = (
        merged.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__src")
    )
    if tombstone_col:
        out = out.filter(
            ~F.coalesce(F.col(tombstone_col), F.lit(False))
        ).drop(tombstone_col)
    return out


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    rates: dict,
    key_col: str,
    seed: int = 42,
    default_rate: float = 0.0,
) -> DataFrame:
    """Deterministic per-stratum sampling: each row keeps with its
    stratum's rate (`rates[stratum]`, else `default_rate`), decided by
    the same md5-uniform as :func:`hash_sample` over `key_col` — so
    membership is stable across partitioning/engines AND a row keeps
    its fate when its stratum's rate only increases (nested samples:
    the 10% sample is a superset of the 5% one). Corpus re-balancing
    (up/down-weighting sources) without an RNG stream. Zero shuffle;
    the rate table inlines as a literal map (strata counts are
    human-scale — for a million-strata table join a rates DataFrame
    instead)."""
    for v in rates.values():
        assert 0.0 <= float(v) <= 1.0
    pairs = []
    for kv, rv in sorted(rates.items()):
        pairs.extend([F.lit(kv), F.lit(float(rv))])
    rate = F.coalesce(
        F.create_map(*pairs)[F.col(strata_col)] if pairs else F.lit(None),
        F.lit(float(default_rate)),
    )
    return df.filter(_unit_hash(key_col, seed) < rate)


def mixture_sample(
    df: DataFrame,
    source_col: str,
    weights: dict,
    key_col: str,
    seed: int = 42,
    scale: float = 1.0,
) -> DataFrame:
    """Downsample a multi-source corpus to a TARGET MIXTURE: `weights`
    gives the desired proportion per source (relative; e.g.
    ``{"web": 6, "code": 3, "wiki": 1}``), and the operator computes the
    largest total achievable WITHOUT upsampling any source — the
    binding source keeps 100%, every other source downsamples to hold
    the ratios — then hash-samples each source at its derived rate
    (same md5-uniform as :func:`hash_sample`, so the result is
    deterministic, engine-stable, and nested under `scale`). Sources
    absent from `weights` are dropped. `scale` < 1 shrinks the whole
    mixture proportionally (e.g. a 10% pilot corpus with the same mix).

    This is THE knob a training run turns: "make the corpus 60% web,
    30% code, 10% wiki" — :func:`stratified_sample` with rates solved
    from the data instead of supplied.

    Scale: one skinny `groupBy(source).count()` (#sources rows to the
    driver — domain counts are human-scale), then a zero-shuffle
    filter. The expected output size is `scale · T · Σw` where
    `T = min_s(count_s / w_s)`.
    """
    if not weights:
        raise ValueError("weights must be a non-empty {source: weight} dict")
    for v in weights.values():
        if not float(v) > 0.0:
            raise ValueError("mixture weights must be > 0")
    if not 0.0 < float(scale) <= 1.0:
        raise ValueError("scale must be in (0, 1]")
    wsum = float(sum(float(v) for v in weights.values()))
    norm = {k: float(v) / wsum for k, v in sorted(weights.items())}
    counts = {
        r["__s"]: r["__n"]
        for r in df.filter(
            F.col(source_col).isin(list(norm))
        )
        .groupBy(F.col(source_col).alias("__s"))
        .agg(F.count(F.lit(1)).alias("__n"))
        .collect()
    }
    missing = [s for s in norm if counts.get(s, 0) == 0]
    if missing:
        raise ValueError(
            f"weighted sources have no rows: {missing} — a zero-count "
            "source makes the target mixture infeasible"
        )
    total = min(counts[s] / norm[s] for s in norm)
    rates = {s: min(1.0, total * norm[s] / counts[s] * float(scale)) for s in norm}
    return stratified_sample(
        df, source_col, rates, key_col, seed=seed, default_rate=0.0
    )


def temperature_mixture(
    df: DataFrame,
    source_col: str,
    key_col: str,
    alpha: float = 0.5,
    seed: int = 42,
    scale: float = 1.0,
) -> DataFrame:
    """Temperature-based mixture resampling — :func:`mixture_sample`
    with the target proportions DERIVED from the data: source s gets
    weight ``count_s ** alpha`` (the mC4/T5 alpha-sampling rule;
    public method, Raffel et al. 2020 §2.3 / Conneau et al. 2020).
    ``alpha = 1`` keeps the natural mix, ``alpha = 0`` forces uniform,
    and the usual 0.2-0.7 band lifts tail sources (rare languages /
    small domains) without letting any single head source dominate —
    the standard knob for multilingual pretraining mixes.

    Like :func:`mixture_sample`, the result is the largest corpus
    achievable WITHOUT upsampling: the binding source keeps 100% and
    every other source hash-downsamples to hold the temperature
    ratios; membership depends only on ``key_col``'s md5-uniform, so
    the subset is deterministic across runs, partitionings, and
    engines.

    The no-upsampling rate has a CLOSED FORM — the normalizing weight
    sum cancels out of the binding-source argmin, leaving

        rate_s = min(1, scale · (n_min / n_s)^(1−alpha))

    (the SMALLEST source binds: flattening can't upsample the tail).
    Both engines evaluate this identical expression — one IEEE
    division, one glibc ``pow``, one multiply per source; no float
    SUM whose accumulation order could differ between engines.

    Scale: one skinny ``groupBy(source).count()`` (#sources rows to
    the driver — human-scale), then a zero-shuffle filter.
    """
    a = float(alpha)
    if not 0.0 <= a <= 1.0:
        raise ValueError(f"alpha must be in [0, 1]: {alpha}")
    if not 0.0 < float(scale) <= 1.0:
        raise ValueError("scale must be in (0, 1]")
    counts = {
        r["__s"]: int(r["__n"])
        for r in df.filter(F.col(source_col).isNotNull())
        .groupBy(F.col(source_col).alias("__s"))
        .agg(F.count(F.lit(1)).alias("__n"))
        .collect()
    }
    if not counts:
        raise ValueError("temperature_mixture: no non-NULL source rows")
    n_min = min(counts.values())
    rates = {
        s: min(1.0, float(scale) * (float(n_min) / float(n)) ** (1.0 - a))
        for s, n in counts.items()
    }
    return stratified_sample(
        df, source_col, rates, key_col, seed=seed, default_rate=0.0)


def temperature_mixture_sql(
    table: str,
    source_col: str,
    key_col: str,
    alpha: float = 0.5,
    seed: int = 42,
    scale: float = 1.0,
    select: str = "*",
) -> str:
    """DuckDB mirror of :func:`temperature_mixture`: the same
    closed-form rate ``min(1, scale·(n_min/n_s)^(1−alpha))`` — one
    division, one glibc ``pow``, one multiply, evaluated in the same
    order as the driver floats — and membership by the same md5 key
    uniform."""
    a = float(alpha)
    if not 0.0 <= a <= 1.0:
        raise ValueError(f"alpha must be in [0, 1]: {alpha}")
    if not 0.0 < float(scale) <= 1.0:
        raise ValueError("scale must be in (0, 1]")
    sc = float(scale)
    u = unit_hash_sql(f"t.{key_col}", int(seed))
    return f"""
WITH __c AS (
  SELECT {source_col} AS __s, count(*)::BIGINT AS __n
  FROM {table} WHERE {source_col} IS NOT NULL GROUP BY 1
), __r AS (
  SELECT __s,
         least(1.0::DOUBLE,
               {sc!r} * pow(CAST(min(__n) OVER () AS DOUBLE)
                            / CAST(__n AS DOUBLE),
                            {(1.0 - a)!r})) AS __rate
  FROM __c
)
SELECT {select} FROM {table} t
JOIN __r ON t.{source_col} = __r.__s
WHERE {u} < __r.__rate
"""


def group_quota(
    df: DataFrame,
    group_col: str,
    n: int,
    order_col: Optional[str] = None,
    seed: int = 42,
) -> DataFrame:
    """At most `n` rows per group — downsampling over-represented
    sources/domains is the standard corpus-balancing move. Order inside
    a group: by `order_col` asc, else by the deterministic hash (a
    seeded uniform draw). One shuffle on the group key; skew bounded by
    the window's per-key top-n."""
    if order_col is not None:
        order = [F.col(order_col).asc()]
    else:
        order = [_unit_hash(group_col, seed).asc()]
    # tie-safe: hash ordering alone can collide across rows with equal
    # keys; row_number needs a total order per group for determinism, so
    # callers should pass an order_col that is unique within the group
    w = Window.partitionBy(group_col).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= int(n))
        .drop("__rn")
    )


def running_totals(
    df: DataFrame,
    order_col: str,
    value_cols: Sequence[str],
    out_cols: Sequence[str],
) -> DataFrame:
    """Global running sums of each of `value_cols` in `order_col` order
    WITHOUT the single-partition collapse a partition-less Spark window
    plans: range-repartition by the order key, per-partition running
    sums, then broadcast-join the tiny cumulative per-partition offsets
    (same two-phase shape as the zkNN global rank). `order_col` must be
    globally unique for a deterministic result. The input is
    localCheckpoint'ed to pin row→partition placement (range boundaries
    are sampled, so a recompute could move rows).

    The multi-column form exists so callers that need several cumsums
    over the SAME order (e.g. the two CDFs of a KS test, one per group)
    pay ONE range-repartition + checkpoint + offsets program instead of
    chaining one per column."""
    if len(value_cols) != len(out_cols) or not value_cols:
        raise ValueError("value_cols and out_cols must be same-length, >= 1")
    n = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200"))
    d = (
        df.repartitionByRange(n, F.col(order_col).asc())
        .sortWithinPartitions(F.col(order_col).asc())
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    woff = (
        Window.orderBy(F.col("__pid").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = [f"__off{i}" for i in range(len(value_cols))]
    offsets = d.groupBy("__pid").agg(
        *[F.sum(F.col(v).cast("long")).alias(f"__s{i}")
          for i, v in enumerate(value_cols)]
    )
    for i in range(len(value_cols)):
        offsets = offsets.withColumn(
            offs[i],
            F.coalesce(F.sum(f"__s{i}").over(woff), F.lit(0)),
        ).drop(f"__s{i}")
    wrun = (
        Window.partitionBy("__pid")
        .orderBy(F.col(order_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = d.join(F.broadcast(offsets), on="__pid", how="inner")
    for v, o, offc in zip(value_cols, out_cols, offs):
        out = out.withColumn(
            o, F.sum(F.col(v).cast("long")).over(wrun) + F.col(offc))
    return out.drop("__pid", *offs)


def running_total(
    df: DataFrame, order_col: str, value_col: str, out_col: str = "__cum"
) -> DataFrame:
    """Single-column :func:`running_totals` (the original surface)."""
    return running_totals(df, order_col, [value_col], [out_col])


def global_order(
    df: DataFrame,
    key_col: str,
    seed: int = 42,
    out_col: str = "train_order",
) -> DataFrame:
    """Deterministic global shuffle for training order: every row gets a
    0-based `out_col` rank under a pseudorandom-but-reproducible
    permutation (ordering by the md5 of its key). Same seed + same data
    → the same permutation on any cluster, any partitioning, any
    engine; changing the seed reshuffles. THE standard "shuffle the
    corpus before epoch 0" op, without an RNG stream or a collect.

    The order key is `md5(key#seed) || '|' || key`, so ties are
    impossible even on the (astronomically unlikely) hash collision —
    the rank is total and deterministic for unique keys.

    Scale: two-phase rank via :func:`running_total` — range-repartition
    on the hash (uniform by construction, so the range partitions are
    balanced), per-partition ranks, broadcast of per-partition offsets
    (one row per partition). Never a single-partition window.
    """
    hashed = df.withColumn(
        "__go",
        F.concat(
            F.md5(F.concat(F.col(key_col).cast("string"), F.lit(f"#{seed}"))),
            F.lit("|"),
            F.col(key_col).cast("string"),
        ),
    ).withColumn("__one", F.lit(1))
    out = running_total(hashed, "__go", "__one", out_col)
    return out.withColumn(out_col, F.col(out_col) - 1).drop("__go", "__one")


def pack_sequences(
    df: DataFrame,
    size_col: str,
    target: int,
    order_col: str = None,
    partition_col: Optional[str] = None,
) -> DataFrame:
    """Greedy sequence packing: walk rows in `order_col` order; a row's
    pack is `floor(start_offset / target)` where start_offset is the
    running size total before the row — near-target training batches in
    one pass. Exact bin packing is NP-hard and inherently sequential;
    the cumulative-quota rule is the standard distributed approximation
    (deterministic given the order; a pack overshoots `target` by at
    most one row's size).

    With `partition_col`, packing restarts per group (e.g. per source)
    and uses an ordinary partitioned window. Without it, the global
    running sum uses :func:`running_total` — two-phase, never a
    single-partition window. Adds `pack_id` and `pack_pos` (1-based
    position inside the pack).
    """
    assert order_col is not None, "pack_sequences requires order_col"
    sz = F.col(size_col).cast("long")
    if partition_col is not None:
        w = Window.partitionBy(partition_col).orderBy(
            F.col(order_col).asc()
        ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
        out = df.withColumn("__cum", F.sum(sz).over(w))
    else:
        out = running_total(df, order_col, size_col, "__cum")
    out = out.withColumn(
        "pack_id", F.floor((F.col("__cum") - sz) / F.lit(int(target))).cast("long")
    ).drop("__cum")
    part = [partition_col] if partition_col else []
    wp = Window.partitionBy(*(part + ["pack_id"])).orderBy(F.col(order_col).asc())
    return out.withColumn("pack_pos", F.row_number().over(wp))


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    n_salts: int = 16,
    how: str = "inner",
    seed: int = 42,
) -> DataFrame:
    """Skew-salted equi-join: identical results to ``left.join(right,
    on, how)`` with hot join keys spread across ``n_salts`` reducers.

    Each left row gets a deterministic pseudo-random salt (xxhash64 of
    its join-key values + a per-row disambiguator hashed over ALL
    columns, mod n_salts); the right side is replicated once per salt
    value (explode of a literal sequence — n_salts× the right rows, so
    size the salt count to the skew, not to the cluster). The join key
    becomes (keys…, salt): one hot key's rows now land on n_salts
    different reducers instead of one.

    AQE's skew-split covers sort-merge joins after the fact; salting is
    the ahead-of-time fix that also covers the cases AQE can't touch —
    hash aggregation feeding the join, and deliberately co-partitioned
    writes. Supported ``how``: inner / left outer family (the right
    side is the replicated one, so right/full outer would duplicate
    unmatched right rows — rejected loudly)."""
    how_n = how.replace("_", "").lower()
    if how_n in ("right", "rightouter", "full", "fullouter", "outer"):
        raise ValueError(
            "salted_join replicates the RIGHT side; right/full outer joins "
            "would duplicate unmatched right rows — swap the sides or use a "
            "plain join"
        )
    on = list(on)
    n_salts = int(n_salts)
    # pmod, not abs-then-mod: abs(Long.MIN_VALUE) overflows (an error
    # under ANSI), pmod is total and non-negative
    salt = F.pmod(
        F.xxhash64(*[F.col(c) for c in left.columns], F.lit(seed)),
        F.lit(n_salts),
    ).cast("int")
    ls = left.withColumn("__salt", salt)
    rs = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return ls.join(rs, on=on + ["__salt"], how=how).drop("__salt")


def weighted_sample(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    n: int,
    seed: int = 42,
    group_by: Optional[Sequence[str]] = None,
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement: the top-n
    rows by the Efraimidis–Spirakis key ``u^(1/w)`` (u = the engine's
    md5 uniform of `key_col`, w = `weight_col`). Each row's inclusion
    probability is proportional to its weight, membership depends only
    on (key, seed) — stable across partitioning, re-runs, and engines —
    and the n winners are drawn in one pass with no RNG state.

    Plan shape: global top-n = ``orderBy(...).limit(n)`` →
    TakeOrderedAndProject (per-partition partial top-n, n rows to the
    driver side of the exchange — never a full sort). With `group_by`,
    a per-group row_number window (one shuffle on the group key).

    Weights must be > 0 — raises (in-plan) otherwise, since a zero or
    negative weight has no E–S key.
    """
    w = F.col(weight_col).cast("double")
    guarded = F.when(
        w > 0, F.pow(_unit_hash(key_col, seed), F.lit(1.0) / w)
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit(f"weighted_sample: non-positive weight in "
                      f"'{weight_col}' for key="),
                F.col(key_col).cast("string"),
            )
        )
    )
    keyed = df.withColumn("__es_key", guarded)
    if group_by:
        win = Window.partitionBy(*group_by).orderBy(
            F.desc("__es_key"), F.col(key_col)
        )
        return (
            keyed.withColumn("__es_rn", F.row_number().over(win))
            .filter(F.col("__es_rn") <= n)
            .drop("__es_key", "__es_rn")
        )
    return (
        keyed.orderBy(F.desc("__es_key"), F.col(key_col))
        .limit(n)
        .drop("__es_key")
    )


def weighted_sample_key_sql(key_expr: str, weight_expr: str, seed: int) -> str:
    """DuckDB mirror of the Efraimidis–Spirakis sampling key."""
    return f"power({unit_hash_sql(key_expr, seed)}, 1.0 / ({weight_expr}))"


def _bloom_positions(key_col, m_bits: int, n_hashes: int, seed: int):
    return [
        F.pmod(F.xxhash64(key_col.cast("string"), F.lit(seed + i)),
               F.lit(int(m_bits)))
        for i in range(int(n_hashes))
    ]


def bloom_bits(df: DataFrame, key_col, m_bits: int = 1 << 20,
               n_hashes: int = 5, seed: int = 42) -> bytes:
    """Build the Bloom bitset of ``key_col`` over ``df`` as plain
    bytes (m/8, byte j holds bits [8j, 8j+8)) — the persistable /
    plan-literal form. The build is a skinny groupBy: k positions per
    distinct key → (word, bit-or) partials → m/64 longs collected to
    the driver (bounded by the m_bits PARAMETER, never by data size)."""
    m_bits = int(m_bits)
    if m_bits < 64 or (m_bits & (m_bits - 1)) != 0:
        raise ValueError("m_bits must be a power of two >= 64")
    if m_bits > (1 << 24):
        raise ValueError(
            "m_bits > 2^24 makes a > 2 MB plan literal; use a broadcast "
            "semi-join for build sides that large")
    key_col = F.col(key_col) if isinstance(key_col, str) else key_col

    def bitmask(pos_col):
        # F.shiftleft only takes a literal shift; the SQL function
        # accepts a column — route through call_function
        return F.call_function(
            "shiftleft",
            F.lit(1).cast("long"),
            pos_col.bitwiseAND(F.lit(63)).cast("int"),
        )

    pos = F.explode(
        F.array(*_bloom_positions(key_col, m_bits, n_hashes, seed))
    ).alias("__pos")
    words = (
        df.select(pos)
        .select(
            F.shiftright("__pos", 6).alias("__w"),
            bitmask(F.col("__pos")).alias("__m"),
        )
        .groupBy("__w")
        .agg(F.bit_or("__m").alias("__bits"))
    )
    packed = bytearray(m_bits // 8)
    for w, bits in words.collect():
        word = int(bits) & 0xFFFFFFFFFFFFFFFF
        base = int(w) * 8
        for j in range(8):
            packed[base + j] = (word >> (8 * j)) & 255
    return bytes(packed)


def bloom_probe(bloom: bytes, key_col, m_bits: int = 1 << 20,
                n_hashes: int = 5, seed: int = 42):
    """Column: membership test of ``key_col`` against a
    :func:`bloom_bits` bitset inlined as ONE BINARY literal. Pure
    scan-stage arithmetic — per hash an O(1) byte substring + hex +
    conv + bit-test, no join node, no array/map expressions (a
    16k-element array literal costs seconds in py4j build + codegen;
    a STRING literal is worse still — UTF8 substring scans from the
    start, O(m) per probe). No false negatives; ~fpr false positives."""
    key_col = F.col(key_col) if isinstance(key_col, str) else key_col
    bloom_bin = F.lit(bloom)
    cond = F.lit(True)
    for p in _bloom_positions(key_col, m_bits, n_hashes, seed):
        byte = F.conv(
            F.hex(
                F.substring(bloom_bin, (F.shiftright(p, 3) + 1).cast("int"), 1)
            ),
            16, 10,
        ).cast("int")
        cond = cond & (
            byte.bitwiseAND(
                F.call_function(
                    "shiftleft", F.lit(1), p.bitwiseAND(F.lit(7)).cast("int")
                )
            )
            != 0
        )
    return cond


def bloom_semi_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: Optional[str] = None,
    m_bits: int = 1 << 20,
    n_hashes: int = 5,
    seed: int = 42,
    how: str = "semi",
) -> DataFrame:
    """Bloom-filter join pruning: filter `big` down to rows whose key
    is (probably) present in `small`, BEFORE any shuffle of `big`.

    ``how='semi'``: returns the filtered big side — every true match
    survives (a Bloom filter has no false negatives), plus ~fpr false
    positives (m=2^20 bits / k=5 hashes ≈ 0.02% fpr at 100k distinct
    keys — size `m_bits` to ~10 bits per distinct small key).
    ``how='inner'``: follows with the exact equi-join, so the result
    EQUALS ``big.join(small, big_key == small_key)`` — the filter only
    moves work, never changes rows.

    This is the ahead-of-time form of Spark's runtime bloom-filter
    injection (spark.sql.optimizer.runtime.bloomFilter), applicable
    when the build side is a separate pipeline stage or the optimizer
    declines. At 100 TB the win is shuffle bytes: the big fact table is
    cut to ~|matches| rows while still in its scan stage.

    The bitset build is a skinny groupBy: k positions per distinct
    small key → (word, bit-or) partials → m/64 longs collected to the
    driver (bounded by the m_bits PARAMETER, never by data size — the
    same class of driver state as a layout bounds table) and inlined as
    ONE BINARY literal (m/8 bytes; byte j holds bits [8j, 8j+8)). The
    probe is then pure scan-stage Column arithmetic — per hash an O(1)
    byte substring + hex + conv + bit-test, no join node, no array/map
    expressions (a 16k-element array literal costs seconds in py4j
    build + codegen; a STRING literal is worse still — UTF8 substring
    scans from the start, O(m) per probe). m_bits is capped at 2^24
    (a 2 MB plan literal); beyond ~1.6 M distinct build keys at 10
    bits/key, send the keys through a regular broadcast semi-join
    instead. Size ~10-14 bits per distinct build key (measured:
    SCALE.md bloom sizing table). At that sizing ``n_hashes=3`` already
    gives ~0.7% fpr — prefer it over the default 5 when m is large:
    every hash is one more explode row per build key and one more
    reference to the m/8-byte literal in the probe plan.
    """
    small_key = small_key or big_key
    bloom = bloom_bits(small, F.col(small_key), m_bits, n_hashes, seed)
    cond = bloom_probe(bloom, F.col(big_key), m_bits, n_hashes, seed)
    filtered = big.filter(cond)
    if how == "semi":
        return filtered
    if how == "inner":
        return filtered.join(
            small, filtered[big_key] == small[small_key], how="inner"
        )
    raise ValueError(f"how must be 'semi' or 'inner', got {how!r}")


def winsorize(
    df: DataFrame,
    col: str,
    id_col: str,
    lo_q: float = 0.01,
    hi_q: float = 0.99,
    mode: str = "clip",
    k: int = 2048,
    seed: int = 42,
    out_col: Optional[str] = None,
) -> DataFrame:
    """Outlier handling by sketched quantile thresholds: values below
    the lo_q / above the hi_q quantile are clipped to the threshold
    (``mode='clip'``, adds ``out_col`` default ``<col>_w``) or their
    rows dropped (``mode='filter'``) — the standard robustification
    pass before normalizing a feature or pricing column at corpus
    scale.

    The thresholds come from the mergeable bottom-k quantile sketch
    (``sketches.quantile_sketch``, ≤ k rows cross the wire) and join
    back as a broadcast 1-row frame — the whole program is ONE plan,
    no driver collect, so it composes lazily inside a larger pipeline
    and the oracle can reproduce it bit-for-bit. Rank error of the
    thresholds is the sketch's ~sqrt(q(1-q)/k); rows NULL in `col`
    pass through clip mode unchanged and are kept by filter mode
    (they carry no evidence of being outliers).
    """
    from .sketches import quantile_digest

    assert mode in ("clip", "filter")
    assert 0.0 <= lo_q < hi_q <= 1.0
    out_col = out_col or f"{col}_w"
    qrow = quantile_digest(
        df, col, id_col, qs=(lo_q, hi_q), k=k, seed=seed,
    ).toDF("__lo", "__hi")
    x = F.col(col).cast("double")
    joined = df.crossJoin(F.broadcast(qrow))
    if mode == "filter":
        return joined.filter(
            x.isNull() | ((x >= F.col("__lo")) & (x <= F.col("__hi")))
        ).drop("__lo", "__hi")
    return joined.withColumn(
        out_col,
        F.when(x.isNull(), x)
        .otherwise(F.least(F.greatest(x, F.col("__lo")), F.col("__hi"))),
    ).drop("__lo", "__hi")


def quantile_bin(
    df: DataFrame,
    col: str,
    id_col: str,
    nbins: int = 10,
    k: int = 2048,
    seed: int = 42,
    out_col: Optional[str] = None,
    group_by: Optional[Sequence[str]] = None,
) -> DataFrame:
    """Equal-frequency discretization: bin index 0..nbins-1 per row,
    cut points at the i/nbins quantiles from the mergeable bottom-k
    quantile sketch (the ML feature-binning / monotonic-bucketing
    pass; Spark ML's QuantileDiscretizer analog, but deterministic,
    engine-reproducible, and a single lazy plan — no fit/transform
    driver round-trip). Ties on a cut go to the upper bin (x >= cut).
    NULL values get a NULL bin. Same scale shape as :func:`winsorize`:
    ≤ k sketch rows per group cross the wire, thresholds join back
    (1-row broadcast when ungrouped, a broadcast per-group cut frame
    with ``group_by`` — per-source/per-language bins from one call),
    assignment is a codegen sum of comparisons. Rows in a group absent
    from the cut frame (all-NULL ids) get NULL bins."""
    from .sketches import quantile_digest

    nbins = int(nbins)
    if nbins < 2:
        raise ValueError(f"nbins must be >= 2: {nbins}")
    out_col = out_col or f"{col}_bin"
    qs = tuple(i / nbins for i in range(1, nbins))
    cuts = [f"__qb{i}" for i in range(1, nbins)]
    gb = list(group_by or [])
    dig = quantile_digest(df, col, id_col, qs=qs, k=k, seed=seed,
                          group_by=gb or None)
    qrow = dig.toDF(*gb, *cuts)
    x = F.col(col).cast("double")
    bin_expr = None
    for c in cuts:
        t = (x >= F.col(c)).cast("int")
        bin_expr = t if bin_expr is None else bin_expr + t
    joined = (df.join(F.broadcast(qrow), on=gb, how="left") if gb
              else df.crossJoin(F.broadcast(qrow)))
    return (
        joined
        .withColumn(out_col,
                    F.when(x.isNull(), F.lit(None).cast("int"))
                    .otherwise(bin_expr))
        .drop(*cuts)
    )


def quantile_bin_sql(
    from_sql: str,
    col_expr: str,
    id_expr: str,
    nbins: int = 10,
    k: int = 2048,
    seed: int = 42,
    out_col: Optional[str] = None,
    select_cols: str = "*",
    group_exprs: Optional[Sequence[str]] = None,
) -> str:
    """DuckDB mirror of :func:`quantile_bin` (same sketch +
    interpolation + comparison-sum arithmetic; ``group_exprs`` mirrors
    ``group_by`` — per-group cut frames LEFT JOINed back, so a group
    absent from the cut frame yields NULL bins in both engines)."""
    from .sketches import _q_name, quantile_estimate_sql, quantile_sketch_sql

    nbins = int(nbins)
    out_col = out_col or f"{col_expr}_bin"
    qs = tuple(i / nbins for i in range(1, nbins))
    groups = list(group_exprs or [])
    qsql = quantile_estimate_sql(
        quantile_sketch_sql(from_sql, col_expr, id_expr, k=k, seed=seed,
                            group_exprs=groups or None),
        qs=qs, group_exprs=groups or None,
    )
    names = [_q_name(q) for q in qs]
    gsel = "".join(f"{g}, " for g in groups)
    thr = ", ".join(f"{n} AS __qb{i + 1}" for i, n in enumerate(names))
    x = f"CAST({col_expr} AS DOUBLE)"
    s = " + ".join(
        f"CASE WHEN ({x}) >= __qb{i + 1} THEN 1 ELSE 0 END"
        for i in range(len(qs)))
    if groups:
        join = (
            f"FROM {from_sql} __t LEFT JOIN "
            f"(SELECT {gsel}{thr} FROM ({qsql})) __q USING ({', '.join(groups)})"
        )
    else:
        join = f"FROM {from_sql} __t, (SELECT {thr} FROM ({qsql})) __q"
    # select_cols='*' qualifies to the SOURCE alias so the __qb
    # threshold columns never leak into the output — Spark drops them,
    # and a leaked __qb1 makes nested quantile_bin_sql calls ambiguous
    if select_cols.strip() == "*":
        select_cols = "__t.*"
    # __qb1 IS NULL (empty sketch — e.g. every binnable row has a NULL
    # id — or a group missing from the cut frame) mirrors Spark's
    # NULL-propagating comparison sum: bin is NULL, not 0
    return f"""
  SELECT {select_cols},
         CASE WHEN ({x}) IS NULL THEN NULL
              WHEN __qb1 IS NULL THEN NULL
              ELSE ({s}) END AS {out_col}
  {join}
"""


def winsorize_sql(
    from_sql: str,
    col_expr: str,
    id_expr: str,
    lo_q: float = 0.01,
    hi_q: float = 0.99,
    mode: str = "clip",
    k: int = 2048,
    seed: int = 42,
    out_col: Optional[str] = None,
    select_cols: str = "*",
) -> str:
    """DuckDB mirror of :func:`winsorize` (same sketch + interpolation
    + clip arithmetic)."""
    from .sketches import _q_name, quantile_estimate_sql, quantile_sketch_sql

    out_col = out_col or f"{col_expr}_w"
    qsql = quantile_estimate_sql(
        quantile_sketch_sql(from_sql, col_expr, id_expr, k=k, seed=seed),
        qs=(lo_q, hi_q),
    )
    # quantile_estimate_sql names columns by promille; rename to lo/hi
    names = [_q_name(lo_q), _q_name(hi_q)]
    thr = (f"SELECT {names[0]} AS __lo, {names[1]} AS __hi "
           f"FROM ({qsql})")
    x = f"CAST({col_expr} AS DOUBLE)"
    if mode == "filter":
        return f"""
  SELECT {select_cols} FROM {from_sql}, ({thr})
  WHERE ({x}) IS NULL OR (({x}) >= __lo AND ({x}) <= __hi)
"""
    return f"""
  SELECT {select_cols},
         CASE WHEN ({x}) IS NULL THEN ({x})
              ELSE least(greatest(({x}), __lo), __hi) END AS {out_col}
  FROM {from_sql}, ({thr})
"""


def rank_normalize(
    df: DataFrame,
    col: str,
    out_col: Optional[str] = None,
    round_to: int = 6,
) -> DataFrame:
    """Percentile-rank feature transform: each non-NULL value mapped to
    ``(rank - 1) / (n - 1)`` in [0, 1] with min-rank tie handling —
    SQL ``percent_rank()`` semantics, the rank-based normalization
    that is robust to outliers and monotone-transform-invariant where
    z-scoring is not. NULLs map to NULL; a single distinct value maps
    to 0.0.

    Scale: never a single-partition global window. Ranks are computed
    on the DISTINCT-VALUE frame (skinny (value, count) rows) with the
    two-phase :func:`running_total`, then joined back on the value —
    a 100 TB column with a million distinct values ranks a
    million-row side table, not the table itself.
    """
    out_col = out_col or f"{col}_pr"
    x = F.col(col)
    vals = (
        df.filter(x.isNotNull())
        .groupBy(x.alias("__rnv"))
        .agg(F.count(F.lit(1)).alias("__rnc"))
    )
    cum = running_total(vals, "__rnv", "__rnc", "__rncum")
    ranked = cum.select(
        "__rnv", (F.col("__rncum") - F.col("__rnc") + 1).alias("__rnrank")
    )
    totals = vals.agg(F.sum("__rnc").alias("__rnn"))
    ranked = ranked.crossJoin(F.broadcast(totals)).select(
        "__rnv",
        F.when(F.col("__rnn") == 1, F.lit(0.0))
        .otherwise(
            F.round(
                (F.col("__rnrank") - 1) / (F.col("__rnn") - 1), round_to
            )
        )
        .alias(out_col),
    )
    return df.join(ranked, df[col] == ranked.__rnv, "left").drop("__rnv")


def rank_normalize_sql(
    from_sql: str,
    col_expr: str,
    out_col: Optional[str] = None,
    round_to: int = 6,
    select_cols: str = "*",
) -> str:
    """DuckDB SQL mirror of :func:`rank_normalize` (percent_rank over
    the non-NULL rows, deduped to per-value rows, LEFT JOINed back)."""
    out_col = out_col or f"{col_expr}_pr"
    if select_cols.strip() == "*":
        select_cols = "__t.*"
    return f"""
WITH __nn AS (
  SELECT {col_expr} AS __v,
         percent_rank() OVER (ORDER BY {col_expr}) AS __pr
  FROM {from_sql} WHERE {col_expr} IS NOT NULL
), __p AS (
  SELECT DISTINCT __v, round(__pr, {int(round_to)}) AS __pr FROM __nn
)
SELECT {select_cols}, __p.__pr AS {out_col}
FROM {from_sql} __t LEFT JOIN __p ON __t.{col_expr} = __p.__v
"""


def impute(
    df: DataFrame,
    cols: Sequence[str],
    strategy: str = "mean",
    group_by: Optional[Sequence[str]] = None,
    fill_map: Optional[dict] = None,
    round_to: int = 6,
    id_col: Optional[str] = None,
    k: int = 256,
) -> DataFrame:
    """NULL/NaN imputation for numeric feature columns — ``mean``
    (per-group, rounded so the fill value is engine/partitioning-
    stable), ``mode`` (most frequent value, minimum-value tiebreak so
    ties are deterministic), or ``constant`` (``fill_map[col]``).

    Scale: ONE skinny pass computes all fill values (a per-group
    aggregate for mean; per-(group, col-value) counts + one window for
    mode — only distinct values cross the wire), broadcast back onto
    the table (AQE broadcasts the fill frame; zero shuffle of the data
    itself for the ungrouped case). A group whose values are ALL null
    keeps its nulls (no global fallback — silently mixing pools is
    the classic leakage bug; compose with a second ungrouped pass if
    that is what you want).
    """
    cols = list(cols)
    groups = list(group_by or [])
    if strategy not in ("mean", "mode", "median", "constant"):
        raise ValueError(f"impute: unknown strategy {strategy!r}")
    if strategy == "median" and id_col is None:
        raise ValueError("impute: strategy='median' needs id_col "
                         "(the sketch's deterministic sample key)")
    if strategy == "constant":
        if not fill_map:
            raise ValueError("impute: strategy='constant' needs fill_map")
        out = df
        for c in cols:
            if c not in fill_map:
                raise ValueError(f"impute: fill_map missing {c!r}")
            v = F.lit(fill_map[c]).cast(dict(df.dtypes)[c])
            out = out.withColumn(
                c, F.coalesce(_non_nan(F.col(c)), v))
        return out

    if strategy == "mean":
        fills = df.groupBy(*groups).agg(*[
            F.round(F.avg(_non_nan(F.col(c))), int(round_to))
            .alias(f"__fill_{c}")
            for c in cols
        ])
    elif strategy == "median":
        # sketched per-group median (bottom-k uniform sample +
        # percentile_cont interpolation) — deterministic, mergeable,
        # ~1.5% rank error at k=256; exact below k rows per group
        from .sketches import quantile_estimate, quantile_sketch

        fills = None
        for c in cols:
            base = df.filter(_non_nan(F.col(c)).isNotNull()) \
                     .withColumn("__iv", _non_nan(F.col(c)))
            sk = quantile_sketch(base, "__iv", id_col,
                                 group_by=groups, k=int(k))
            est = quantile_estimate(sk, [0.5], group_by=groups)
            top = est.select(
                *groups,
                F.round(F.col("q500"), int(round_to))
                .alias(f"__fill_{c}"))
            fills = top if fills is None else (fills.join(
                top, on=groups, how="outer") if groups else
                fills.crossJoin(top))
    else:  # mode
        fills = None
        for c in cols:
            counts = (
                df.filter(_non_nan(F.col(c)).isNotNull())
                .groupBy(*groups, F.col(c).alias("__val"))
                .agg(F.count(F.lit(1)).alias("__n"))
            )
            w = Window.partitionBy(*groups).orderBy(
                F.col("__n").desc(), F.col("__val").asc())
            top = (
                counts.withColumn("__rn", F.row_number().over(w))
                .filter(F.col("__rn") == 1)
                .select(*groups, F.col("__val").alias(f"__fill_{c}"))
            )
            fills = top if fills is None else (fills.join(
                top, on=groups, how="outer") if groups else
                fills.crossJoin(top))
    if groups:
        out = df.join(F.broadcast(fills), on=groups, how="left")
    else:
        out = df.crossJoin(F.broadcast(fills))
    for c in cols:
        out = out.withColumn(
            c, F.coalesce(_non_nan(F.col(c)),
                          F.col(f"__fill_{c}").cast(dict(df.dtypes)[c])))
    return out.drop(*[f"__fill_{c}" for c in cols])


def _non_nan(col):
    """NULL out NaNs so coalesce/avg treat them as missing (Spark avg
    would otherwise propagate NaN; DuckDB avg ignores neither)."""
    return F.when(~F.isnan(col.cast("double")), col)


def dataset_fingerprint(
    df: DataFrame,
    cols: Optional[Sequence[str]] = None,
    sep: str = "\x1f",
) -> DataFrame:
    """Order-insensitive content fingerprint of a DataFrame — ONE row
    ``(n_rows, content_hash)`` where ``content_hash`` is the exact
    BIGINT sum (mod 2^64, wrap-around) of each row's 64-bit md5 prefix
    over the selected columns. Two frames hold the same multiset of
    rows iff (n_rows, content_hash) match (up to md5 collisions): the
    cheap migration/backfill/engine-parity check before reaching for
    the full :func:`table_diff` — no keys needed, no join, one
    combine-friendly aggregate whose partial sums commute, so the
    result is partitioning-, ordering-, and engine-independent.

    Row serialization: each column CAST to string (NULL becomes the
    literal ``\\N`` — distinguishable from the string "null"), joined
    with the 0x1f unit separator. Pick ``cols`` explicitly when
    comparing frames whose column ORDER may differ (the serialization
    is order-sensitive by design: (a, b) != (b, a)). Cross-ENGINE
    comparisons need string-identical casts: Spark renders doubles
    outside [1e-3, 1e7) in scientific notation where DuckDB does not —
    cast such columns to DECIMAL or format them explicitly first
    (cross-PARTITIONING/cross-run comparisons within one engine have
    no such caveat).

    Scale: one projection + one 2-aggregate pass; bytes shuffled are
    two longs per partition.
    """
    use = list(cols) if cols is not None else list(df.columns)
    parts = []
    for c in use:
        parts.append(F.coalesce(F.col(c).cast("string"), F.lit("\\N")))
        parts.append(F.lit(sep))
    rowstr = F.concat(*parts[:-1])
    # 64-bit md5 prefix as two 32-bit halves (neither engine parses a
    # full 16-hex-digit unsigned literal cleanly: Spark's conv output
    # is a string, DuckDB's '0x..'::BIGINT caps at 63 bits)
    md = F.md5(rowstr)
    h_hi = F.conv(F.substring(md, 1, 8), 16, 10).cast("long")
    h_lo = F.conv(F.substring(md, 9, 8), 16, 10).cast("long")
    h = (
        h_hi.cast("decimal(38,0)") * F.lit(4294967296).cast("decimal(38,0)")
        + h_lo.cast("decimal(38,0)")
    )
    # exact sum in DECIMAL(38), wrapped into signed-64 space: the same
    # arithmetic is expressible in DuckDB (HUGEINT % / cast), and long
    # overflow semantics never enter the plan
    two64 = F.expr("CAST(18446744073709551616 AS DECIMAL(38,0))")
    two63 = F.expr("CAST(9223372036854775808 AS DECIMAL(38,0))")
    s = F.sum(h).cast("decimal(38,0)") % two64
    wrapped = F.when(s >= two63, s - two64).otherwise(s).cast("long")
    return df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.coalesce(wrapped, F.lit(0)).alias("content_hash"),
    )


def dataset_fingerprint_sql(
    from_sql: str,
    cols: Sequence[str],
    sep: str = "\x1f",
) -> str:
    """DuckDB mirror of :func:`dataset_fingerprint` (same \\N NULL
    sentinel, unit separator, md5-prefix sum mod 2^64 wrapped to a
    signed BIGINT)."""
    sep_sql = "chr(31)" if sep == "\x1f" else repr(sep)
    parts = " || ".join(
        f"coalesce(CAST({c} AS VARCHAR), '\\N') "
        + (f"|| {sep_sql}" if i < len(cols) - 1 else "")
        for i, c in enumerate(cols)
    )
    return f"""
WITH __h AS (
  SELECT ('0x' || substr(md5({parts}), 1, 8))::BIGINT
           * CAST(4294967296 AS HUGEINT)
         + ('0x' || substr(md5({parts}), 9, 8))::BIGINT AS __r
  FROM {from_sql}
),
__s AS (
  SELECT count(*) AS n_rows,
         CAST(sum(__r) % CAST(18446744073709551616 AS HUGEINT)
              AS HUGEINT) AS __m
  FROM __h
)
SELECT n_rows,
       coalesce(CAST(CASE WHEN __m >= CAST(9223372036854775808 AS HUGEINT)
                 THEN __m - CAST(18446744073709551616 AS HUGEINT)
                 ELSE __m END AS BIGINT), 0) AS content_hash
FROM __s
"""
