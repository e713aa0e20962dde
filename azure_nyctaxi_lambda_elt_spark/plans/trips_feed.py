"""The "trips feed": a deterministic dirty taxi-trip stream derived from
the driver's `events` table, plus the full batch-ELT pipeline over it.

The reference pipeline's raw input (NYC taxi CSV/JSON with nulls, bad
casts, negative amounts, out-of-order timestamps, duplicate and
late-arriving rows) is reproduced here as a PURE, deterministic
derivation of `events` — so the DuckDB oracle can derive the identical
feed and every stage stays hash-comparable.

Stage parity map (reference file ↔ builder):
- raw_trips        ↔ the raw landing zone (Ingest/upload_raw.sh)
- typed_trips      ↔ stg.trip TRY_CAST staging (sql/batchELT/staging/stg_trip.sql)
- clean + reject   ↔ core.trip_clean_slice CTAS + err.trip capture
  (sql/batchELT/core/11_trip_clean.slice_ctas.sql, err/21_err_trip.capture.sql)
- trip_clean       ↔ deterministic latest-wins dedupe
  (sql/batchELT/core/12_trip_clean.dedupe_load.sql)
- dims + fact      ↔ mdl star schema (mdl/load/10-14_dim_*.upsert.sql,
  40_fact_trip.load.sql, err/seed_unknowns.sql)
- bi_view          ↔ mdl.vw_fact_trip_bi

Scale notes: every stage is narrow (projection/filter) except the
dedupe window and dim distincts — exactly the two shuffles the
reference pays via HASH(trip_id) distribution and dim REPLICATE-ing.
Dims are broadcast into the fact build; the big side never moves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.columns import (
    canonical_map,
    date_key,
    is_night_hour,
    miles_to_km,
    norm_str,
    safe_ratio,
    sha256_key,
    time_key,
    ts_iso,
)
from ..operators.clean import Rule, split_good_bad, typed_cast
from ..operators.dedupe import latest_wins
from ..operators.dims import build_dim, resolve_fk
from ..sources.tables import load_table

# ref.payment_type_map analog (sql/batchELT/ref/01_payment_type_map.sql:
# payment_type_src/std + is_active + valid_from/to validity) as a seeded
# MAINTAINED TABLE instead of a hardcoded literal: a mapping change is a
# seed-row update (or a caller-supplied frame), never a logic edit.
# The inactive '1'->'CREDIT' predecessor exercises the validity-window
# (AS OF) lookup path (payment_map_scd entry).
# Rows: (src, std, is_active, valid_from_utc, valid_to_utc).
PAYMENT_MAP_SEED: list[tuple[str, str, bool, str, str | None]] = [
    ("1", "CREDIT", False, "1970-01-01 00:00:00", "2024-01-16 00:00:00"),
    ("1", "CARD", True, "2024-01-16 00:00:00", None),
    ("2", "CASH", True, "1970-01-01 00:00:00", None),
    ("3", "NO_CHARGE", True, "1970-01-01 00:00:00", None),
    ("4", "DISPUTE", True, "1970-01-01 00:00:00", None),
    ("CRD", "CARD", True, "1970-01-01 00:00:00", None),
    ("CSH", "CASH", True, "1970-01-01 00:00:00", None),
]

# the current-state (active-rows) view of the seed — derived, never
# maintained separately
PAYMENT_MAP = {src: std for src, std, act, _vf, _vt in PAYMENT_MAP_SEED
               if act}


def payment_map_ref(spark: SparkSession,
                    seed: list | None = None) -> DataFrame:
    """The seeded ref.payment_type_map frame (01_payment_type_map.sql)."""
    rows = PAYMENT_MAP_SEED if seed is None else seed
    df = spark.createDataFrame(
        rows,
        "payment_type_src string, payment_type_std string, "
        "is_active boolean, valid_from_utc string, valid_to_utc string")
    return df.select(
        "payment_type_src", "payment_type_std", "is_active",
        F.col("valid_from_utc").cast("timestamp").alias("valid_from_utc"),
        F.col("valid_to_utc").cast("timestamp").alias("valid_to_utc"))


def events_ts_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events with the nanosecond `ts` column converted to a proper
    microsecond timestamp (the driver testdata writes TIMESTAMP(NANOS),
    which Spark reads as long under `nanosAsLong`)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ev = load_table(spark, sf_dir, "events")
    ts_type = dict(ev.dtypes).get("ts")
    if ts_type == "bigint":
        ev = ev.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    elif ts_type == "timestamp_ntz":
        # some Spark builds surface parquet TIMESTAMP(NANOS) as NTZ;
        # session tz is pinned UTC so the cast is value-preserving, and
        # it restores TIMESTAMP for fns that reject NTZ (unix_micros)
        ev = ev.withColumn("ts", F.col("ts").cast("timestamp"))
    return ev


def raw_trips(spark: SparkSession, sf_dir: str,
              spread: bool = True) -> DataFrame:
    """Deterministic dirty trip feed from events (+ late duplicates).

    The events scan is spread across the session's parallelism first
    (sources/tables.py spread_small_scan — no-op above one scan
    split): the feed derivation is ~1.6 s of single-core expression
    work at sf0.1 (string↔timestamp/double round-trips by design)
    that otherwise runs entirely inside the single-task scan stage of
    a 1-row-group input file.  Spread BY event_id: trip_uid IS
    event_id, so the keyed spread already satisfies the latest-wins
    window's required distribution through alias propagation and the
    chain keeps ONE exchange total (plan audited; round-robin would
    add a second).  Batch path only — the streaming lane derives
    from its own micro-batch frames via raw_trips_from_events.

    ``spread=False`` opts a consumer out: measured for the light
    typed-only aggregations (quality_audit) where the derivation is
    cheap enough that the spread exchange costs more than the
    parallelism buys (+0.3 s at sf0.1, min-of-3 A/B)."""
    from ..sources.tables import spread_small_scan

    ev = events_ts_fixed(spark, sf_dir)
    if spread:
        ev = spread_small_scan(ev, by=["event_id"])
    return raw_trips_from_events(ev)


def raw_trips_from_events(e: DataFrame) -> DataFrame:
    """Feed derivation over any events frame — batch OR streaming.

    Late-arriving duplicates for 10% of trips (newer loaded_at, new
    source file, corrected fare +5 — latest-wins must pick these) are
    produced by ONE explode over a per-row is-late array instead of a
    second full select tree + union: one events scan, half the
    expression tree (the union formulation spent ~0.6 s per call in
    driver-side plan construction alone), and explode is narrow +
    stream-legal."""
    eid, uid, val, ts = F.col("event_id"), F.col("user_id"), F.col("value"), F.col("ts")
    late = F.col("__late")
    fare_base = F.when(eid % 53 == 0, -val).otherwise(val)
    fare = F.when(late, fare_base + 5.0).otherwise(fare_base)
    dup = e.select(
        "*",
        F.explode(
            F.when(eid % 10 == 0, F.array(F.lit(False), F.lit(True)))
            .otherwise(F.array(F.lit(False)))).alias("__late"))
    return dup.select(
        eid.alias("trip_uid"),
        F.when(eid % 89 == 0, F.lit("  "))
        .otherwise(F.concat(F.lit("v"), (uid % 5).cast("string")))
        .alias("vendor_raw"),
        F.when(eid % 101 == 0, F.lit(None).cast("string"))
        .otherwise(ts.cast("string"))
        .alias("pickup_raw"),
        ((eid % 600).cast("int") - 30).alias("duration_min"),
        F.expr("CAST(ts + make_dt_interval(0, 0, CAST(event_id % 600 AS INT) - 30, 0) AS STRING)")
        .alias("dropoff_raw"),
        F.when(eid % 97 == 0, F.lit("N/A"))
        .otherwise((val / 16.0).cast("string"))
        .alias("distance_raw"),
        fare.cast("string").alias("fare_raw"),
        (1 + eid % 6).cast("string").alias("payment_src"),
        (1 + eid % 4).cast("string").alias("pax_raw"),
        # RatecodeID analog (mdl/load/12_dim_rate_code.upsert.sql): codes
        # 1..7 + a rare out-of-domain '99' + NULLs (dim keeps whatever
        # non-null codes arrive — the reference applies no domain filter)
        F.when(eid % 113 == 0, F.lit(None).cast("string"))
        .when(eid % 107 == 0, F.lit("99"))
        .otherwise((1 + eid % 7).cast("string"))
        .alias("rate_code_raw"),
        # store_and_fwd_flag analog (mdl/load/13_dim_flag.upsert.sql):
        # messy casing/padding + empties + NULLs; dim NK is
        # UPPER(TRIM(x)) with ''→NULL
        F.when(eid % 131 == 0, F.lit(None).cast("string"))
        .when(eid % 127 == 0, F.lit("  "))
        .when(eid % 11 == 0, F.lit("y"))
        .when(eid % 11 == 5, F.lit(" n "))
        .otherwise(F.lit("N"))
        .alias("store_fwd_raw"),
        (uid % 50).cast("int").alias("pu_loc_id"),
        ((uid + 7) % 50).cast("int").alias("do_loc_id"),
        (val * ((eid % 30).cast("double") / F.lit(100.0))).cast("string").alias("tip_raw"),
        ts.cast("date").alias("ingest_date"),
        F.concat(F.when(late, "late_").otherwise("events_"),
                 ts.cast("date").cast("string"), F.lit(".parquet"))
        .alias("source_file_name"),
        F.when(late, F.expr("ts + INTERVAL 1 HOUR")).otherwise(ts).alias("loaded_at"),
    )


def typed_trips(raw: DataFrame) -> DataFrame:
    """stg.trip analog: TRY_CAST coercion + string normalization."""
    typed = typed_cast(
        raw,
        {
            "pickup_raw": "timestamp",
            "dropoff_raw": "timestamp",
            "distance_raw": "double",
            "fare_raw": "double",
            "tip_raw": "double",
            "pax_raw": "int",
        },
    )
    return typed.select(
        "trip_uid",
        norm_str("vendor_raw").alias("vendor_code"),
        F.col("pickup_raw").alias("pickup_ts"),
        F.col("dropoff_raw").alias("dropoff_ts"),
        "duration_min",
        F.col("distance_raw").alias("trip_distance"),
        F.col("fare_raw").alias("fare_amount"),
        F.col("tip_raw").alias("tip_amount"),
        F.col("pax_raw").alias("passenger_count"),
        "payment_src",
        F.col("rate_code_raw").alias("rate_code"),
        F.col("store_fwd_raw").alias("store_fwd_flag"),
        "pu_loc_id",
        "do_loc_id",
        "ingest_date",
        "source_file_name",
        "loaded_at",
    )


def trip_reject_rules() -> list[Rule]:
    # order matters: first match wins (err/21_err_trip.capture.sql CASE)
    return [
        Rule("NEGATIVE_FARE", F.col("fare_amount") < 0),
        Rule("NEGATIVE_DISTANCE", F.col("trip_distance") < 0),
        Rule("PICKUP_AFTER_DROPOFF", F.col("pickup_ts") > F.col("dropoff_ts")),
        Rule(
            "OTHER_BAD_VALUES",
            F.col("pickup_ts").isNull()
            | F.col("dropoff_ts").isNull()
            | F.col("trip_distance").isNull()
            | F.col("fare_amount").isNull(),
        ),
    ]


def split_trips(typed: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(good, rejected-with-reason) — err.trip capture analog."""
    return split_good_bad(typed, trip_reject_rules())


def clean_slice(typed: DataFrame,
                payment_map: DataFrame | None = None) -> DataFrame:
    """core.trip_clean_slice analog (slice_ctas.sql SELECT list).

    The payment canonicalization resolves through the maintained
    ref.payment_type_map (ref/01_payment_type_map.sql) — a mapping
    change is a ref-table row update (PAYMENT_MAP_SEED or a
    caller-supplied ``payment_map`` frame), never a logic edit.  When
    a frame is passed, its active rows BROADCAST-JOIN in (the shape
    for maps too large to inline — thousands of MCC codes, say);
    active src values are unique by construction
    (tests/test_payment_map.py), so the left join is row-preserving.
    With the default seed the active rows compile to a map-side CASE
    instead: semantically the identical lookup (the join-vs-CASE
    equality is pinned by test_join_map_equals_case_literal), but it
    skips a per-query 7-row BroadcastExchange job whose fixed
    scheduling latency (~0.4 s) dominated the bench ELT chain.
    Unmapped codes surface as NULL either way, exactly like the
    reference's unmatched lookup."""
    good, _ = split_trips(typed)
    if payment_map is not None:
        active = F.broadcast(
            payment_map.where(F.col("is_active"))
            .select(F.col("payment_type_src").alias("payment_src"),
                    "payment_type_std"))
        good = good.join(active, "payment_src", "left")
    else:
        good = good.withColumn(
            "payment_type_std", canonical_map("payment_src", PAYMENT_MAP))
    return good.select(
        F.col("vendor_code"),
        F.col("trip_uid"),
        F.col("pickup_ts").alias("pickup_ts_utc"),
        F.col("dropoff_ts").alias("dropoff_ts_utc"),
        miles_to_km("trip_distance").alias("trip_distance_km"),
        # quantize to cents via DECIMAL(9,2), then surface as DOUBLE:
        # the driver's value-hasher represents DECIMAL differently per
        # engine, so the query-output convention is plain double
        F.col("fare_amount").cast("decimal(9,2)").cast("double").alias("fare_amount"),
        F.col("payment_type_std").alias("payment_type"),
        F.col("rate_code").alias("rate_code_nk"),
        norm_str("store_fwd_flag").alias("flag_nk"),
        is_night_hour("pickup_ts").alias("is_night_ride"),
        F.col("tip_amount"),
        "pu_loc_id",
        "do_loc_id",
        "passenger_count",
        "ingest_date",
        "source_file_name",
        "loaded_at",
    )


def trip_clean(typed: DataFrame) -> DataFrame:
    """core.trip_clean analog: slice + deterministic latest-wins dedupe."""
    return latest_wins(
        clean_slice(typed),
        ["trip_uid"],
        [F.col("loaded_at").desc(), F.col("source_file_name").desc()],
    )


def dim_vendor(clean: DataFrame) -> DataFrame:
    return build_dim(clean, ["vendor_code"], "vendor_key", unknown_nk="UNKNOWN")


def dim_payment(clean: DataFrame) -> DataFrame:
    return build_dim(clean.withColumnRenamed("payment_type", "payment_type_nk"),
                     ["payment_type_nk"], "payment_type_key", unknown_nk="UNKNOWN")


def dim_rate_code(clean: DataFrame) -> DataFrame:
    """mdl/load/12_dim_rate_code.upsert.sql + err/seed_unknowns.sql."""
    return build_dim(clean, ["rate_code_nk"], "rate_code_key",
                     unknown_nk="UNKNOWN")


def dim_flag(clean: DataFrame) -> DataFrame:
    """mdl/load/13_dim_flag.upsert.sql + err/seed_unknowns.sql."""
    return build_dim(clean, ["flag_nk"], "flag_key", unknown_nk="UNKNOWN")


def dim_location(clean: DataFrame) -> DataFrame:
    """Union of PU/DO zone ids (mdl/load/14_dim_location.upsert.sql)."""
    ids = (
        clean.select(F.col("pu_loc_id").alias("location_id_nk"))
        .unionByName(clean.select(F.col("do_loc_id").alias("location_id_nk")))
    )
    return build_dim(ids, ["location_id_nk"], "location_key", unknown_nk=-1)


def fact_trip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mdl.fact_trip analog — the flagship end-to-end plan.

    `clean` is persisted: the reference MATERIALIZES core.trip_clean
    before the star build, and without it Spark recomputes the
    scan→clean→dedupe subtree once per dim build + FK join (28 scans /
    50 windows in the unpersisted plan). At warehouse scale the same
    role is played by the written trip_clean table (see
    write_partition_overwrite); in-memory persist is the single-query
    analog."""
    typed = typed_trips(raw_trips(spark, sf_dir))
    clean = trip_clean(typed).persist()
    return fact_from_clean(clean)


def fused_star_dims(clean: DataFrame) -> dict[str, DataFrame]:
    """All 5 NK dims from ONE melt pass (operators/dims.py
    build_dims_fused): one scan of trip_clean + one distinct shuffle
    replaces five distinct+rank subtrees.  Keys are identical to the
    per-dim build_dim outputs (equality pinned in
    tests/test_fact_plan_guardrail.py)."""
    from ..operators.dims import build_dims_fused, slice_fused_dim

    ranked = build_dims_fused(
        clean,
        [("vendor", F.col("vendor_code")),
         ("payment", F.col("payment_type")),
         ("rate_code", F.col("rate_code_nk")),
         ("flag", F.col("flag_nk")),
         ("location", F.col("pu_loc_id")),
         ("location", F.col("do_loc_id"))],
        pad_dims=["location"],
    )
    return {
        "vendor": slice_fused_dim(
            ranked, "vendor", "vendor_key", "vendor_code",
            "string", "UNKNOWN"),
        "payment": slice_fused_dim(
            ranked, "payment", "payment_type_key", "payment_type_nk",
            "string", "UNKNOWN"),
        "rate_code": slice_fused_dim(
            ranked, "rate_code", "rate_code_key", "rate_code_nk",
            "string", "UNKNOWN"),
        "flag": slice_fused_dim(
            ranked, "flag", "flag_key", "flag_nk", "string", "UNKNOWN"),
        "location": slice_fused_dim(
            ranked, "location", "location_key", "location_id_nk",
            "int", -1),
    }


def fact_from_clean(clean: DataFrame) -> DataFrame:
    """The dim-build + FK-resolve + project stage of the star build,
    over an (ideally materialized) trip_clean frame.  Split out so the
    bench can time the dim-resolve stage on its own
    (tests/test_fact_plan_guardrail.py pins the plan shape).

    Dims come from the FUSED melt build (fused_star_dims): one scan of
    trip_clean + one distinct shuffle instead of five distinct+rank
    subtrees — at warehouse scale that is 1 pass over the fact instead
    of 6.  Each dim then broadcasts into the FK chain exactly as
    before."""
    dims = fused_star_dims(clean)
    v, p, rc = dims["vendor"], dims["payment"], dims["rate_code"]
    fl, loc = dims["flag"], dims["location"]

    f = resolve_fk(clean, v, [("vendor_code", "vendor_code")], "vendor_key")
    f = resolve_fk(f, p, [("payment_type", "payment_type_nk")], "payment_type_key")
    f = resolve_fk(f, rc, [("rate_code_nk", "rate_code_nk")], "rate_code_key")
    f = resolve_fk(f, fl, [("flag_nk", "flag_nk")], "flag_key")
    f = resolve_fk(f, loc.withColumnRenamed("location_key", "pu_location_key"),
                   [("pu_loc_id", "location_id_nk")], "pu_location_key")
    f = resolve_fk(f, loc.withColumnRenamed("location_key", "do_location_key"),
                   [("do_loc_id", "location_id_nk")], "do_location_key")
    return f.select(
        sha256_key(
            F.coalesce(norm_str(F.col("vendor_code")), F.lit("")),
            ts_iso("pickup_ts_utc"),
            ts_iso("dropoff_ts_utc"),
            F.col("fare_amount").cast("decimal(18,2)"),
            F.col("trip_distance_km").cast("decimal(18,3)"),
            F.coalesce(norm_str(F.col("payment_type")), F.lit("")),
        ).alias("trip_id"),
        date_key("pickup_ts_utc").alias("pickup_date_key"),
        time_key("pickup_ts_utc").alias("pickup_time_key"),
        "vendor_key",
        "payment_type_key",
        "rate_code_key",
        "flag_key",
        "pu_location_key",
        "do_location_key",
        "trip_distance_km",
        "fare_amount",
        F.col("tip_amount"),
        "is_night_ride",
        "ingest_date",
        "source_file_name",
        "loaded_at",
    )


def bi_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mdl.vw_fact_trip_bi analog: flattened fact + ratio metrics."""
    typed = typed_trips(raw_trips(spark, sf_dir))
    clean = trip_clean(typed).persist()
    v = dim_vendor(clean)
    p = dim_payment(clean)

    f = resolve_fk(clean, v, [("vendor_code", "vendor_code")], "vendor_key")
    f = resolve_fk(f, p, [("payment_type", "payment_type_nk")], "payment_type_key")
    return f.select(
        date_key("pickup_ts_utc").alias("pickup_date_key"),
        F.col("pickup_ts_utc").cast("date").alias("pickup_date"),
        F.hour("pickup_ts_utc").alias("pickup_hour"),
        F.col("is_night_ride"),
        F.coalesce(F.col("vendor_code"), F.lit("UNKNOWN")).alias("vendor_code"),
        F.coalesce(F.col("payment_type"), F.lit("UNKNOWN")).alias("payment_type"),
        F.col("trip_distance_km"),
        F.col("fare_amount"),
        F.col("tip_amount"),
        safe_ratio(F.col("tip_amount"), F.col("fare_amount").cast("double")).alias("tip_pct"),
        safe_ratio(F.col("fare_amount").cast("double"), F.col("trip_distance_km")).alias("fare_per_km"),
        "ingest_date",
        "source_file_name",
    )
