"""DuckDB oracle CTE fragments mirroring plans/trips_feed.py exactly.

Every fragment is ANSI-ish SQL the driver's DuckDB can run against the
pre-registered parquet views. The Spark builders and these CTEs are
maintained as a PAIR — any change to one must change the other (the
parity test in tests/test_oracle_parity.py enforces it).
"""

RAW_SELECT = """
  SELECT
    event_id AS trip_uid,
    CASE WHEN event_id % 89 = 0 THEN '  '
         ELSE 'v' || CAST(user_id % 5 AS VARCHAR) END AS vendor_raw,
    CASE WHEN event_id % 101 = 0 THEN NULL
         ELSE CAST(ts AS VARCHAR) END AS pickup_raw,
    CAST(event_id % 600 AS INT) - 30 AS duration_min,
    CAST(ts + to_minutes(CAST(event_id % 600 AS INT) - 30) AS VARCHAR) AS dropoff_raw,
    CASE WHEN event_id % 97 = 0 THEN 'N/A'
         ELSE CAST(value / 16.0 AS VARCHAR) END AS distance_raw,
    CAST({fare_expr} AS VARCHAR) AS fare_raw,
    CAST(1 + event_id % 6 AS VARCHAR) AS payment_src,
    CAST(1 + event_id % 4 AS VARCHAR) AS pax_raw,
    CASE WHEN event_id % 113 = 0 THEN NULL
         WHEN event_id % 107 = 0 THEN '99'
         ELSE CAST(1 + event_id % 7 AS VARCHAR) END AS rate_code_raw,
    CASE WHEN event_id % 131 = 0 THEN NULL
         WHEN event_id % 127 = 0 THEN '  '
         WHEN event_id % 11 = 0 THEN 'y'
         WHEN event_id % 11 = 5 THEN ' n '
         ELSE 'N' END AS store_fwd_raw,
    CAST(user_id % 50 AS INT) AS pu_loc_id,
    CAST((user_id + 7) % 50 AS INT) AS do_loc_id,
    CAST(value * (CAST(event_id % 30 AS DOUBLE) / 100.0) AS VARCHAR) AS tip_raw,
    CAST(ts AS DATE) AS ingest_date,
    '{src_prefix}' || CAST(CAST(ts AS DATE) AS VARCHAR) || '.parquet' AS source_file_name,
    {loaded_at} AS loaded_at
  FROM events
  {where}
"""

_FARE = "CASE WHEN event_id % 53 = 0 THEN -value ELSE value END"

TRIPS_CTES = f"""
raw_trips AS (
{RAW_SELECT.format(fare_expr=_FARE, src_prefix='events_', loaded_at='ts', where='')}
  UNION ALL
{RAW_SELECT.format(fare_expr='(' + _FARE + ') + 5.0', src_prefix='late_',
                   loaded_at="ts + INTERVAL 1 HOUR",
                   where='WHERE event_id % 10 = 0')}
),
typed_trips AS (
  SELECT
    trip_uid,
    UPPER(NULLIF(TRIM(vendor_raw), '')) AS vendor_code,
    TRY_CAST(pickup_raw AS TIMESTAMP) AS pickup_ts,
    TRY_CAST(dropoff_raw AS TIMESTAMP) AS dropoff_ts,
    duration_min,
    TRY_CAST(distance_raw AS DOUBLE) AS trip_distance,
    TRY_CAST(fare_raw AS DOUBLE) AS fare_amount,
    TRY_CAST(tip_raw AS DOUBLE) AS tip_amount,
    TRY_CAST(pax_raw AS INT) AS passenger_count,
    payment_src,
    rate_code_raw AS rate_code,
    store_fwd_raw AS store_fwd_flag,
    pu_loc_id, do_loc_id,
    ingest_date, source_file_name, loaded_at
  FROM raw_trips
),
rejected_trips AS (
  SELECT *,
    CASE
      WHEN fare_amount < 0 THEN 'NEGATIVE_FARE'
      WHEN trip_distance < 0 THEN 'NEGATIVE_DISTANCE'
      WHEN pickup_ts > dropoff_ts THEN 'PICKUP_AFTER_DROPOFF'
      ELSE 'OTHER_BAD_VALUES'
    END AS reject_reason
  FROM typed_trips
  WHERE fare_amount < 0 OR trip_distance < 0 OR pickup_ts > dropoff_ts
     OR pickup_ts IS NULL OR dropoff_ts IS NULL
     OR trip_distance IS NULL OR fare_amount IS NULL
),
clean_slice AS (
  SELECT
    vendor_code,
    trip_uid,
    pickup_ts AS pickup_ts_utc,
    dropoff_ts AS dropoff_ts_utc,
    round(trip_distance * 1.609344, 3) AS trip_distance_km,
    CAST(CAST(fare_amount AS DECIMAL(9,2)) AS DOUBLE) AS fare_amount,
    CASE payment_src WHEN '1' THEN 'CARD' WHEN '2' THEN 'CASH'
                     WHEN '3' THEN 'NO_CHARGE' WHEN '4' THEN 'DISPUTE' END AS payment_type,
    rate_code AS rate_code_nk,
    UPPER(NULLIF(TRIM(store_fwd_flag), '')) AS flag_nk,
    CASE WHEN pickup_ts IS NOT NULL
          AND (hour(pickup_ts) >= 22 OR hour(pickup_ts) <= 5)
         THEN 1 ELSE 0 END AS is_night_ride,
    tip_amount, pu_loc_id, do_loc_id, passenger_count,
    ingest_date, source_file_name, loaded_at
  FROM typed_trips
  WHERE pickup_ts IS NOT NULL AND dropoff_ts IS NOT NULL
    AND pickup_ts <= dropoff_ts AND fare_amount >= 0 AND trip_distance >= 0
),
trip_clean AS (
  SELECT * EXCLUDE (rn) FROM (
    SELECT s.*, ROW_NUMBER() OVER (
        PARTITION BY trip_uid
        ORDER BY loaded_at DESC, source_file_name DESC) AS rn
    FROM clean_slice s) t
  WHERE rn = 1
),
dim_vendor AS (
  SELECT CAST(dense_rank() OVER (ORDER BY vendor_code ASC) AS INT) AS vendor_key,
         vendor_code
  FROM (SELECT DISTINCT vendor_code FROM trip_clean WHERE vendor_code IS NOT NULL) v
  UNION ALL SELECT -1, 'UNKNOWN'
),
dim_payment AS (
  SELECT CAST(dense_rank() OVER (ORDER BY payment_type_nk ASC) AS INT) AS payment_type_key,
         payment_type_nk
  FROM (SELECT DISTINCT payment_type AS payment_type_nk FROM trip_clean
        WHERE payment_type IS NOT NULL) p
  UNION ALL SELECT -1, 'UNKNOWN'
),
dim_rate_code AS (
  SELECT CAST(dense_rank() OVER (ORDER BY rate_code_nk ASC) AS INT) AS rate_code_key,
         rate_code_nk
  FROM (SELECT DISTINCT rate_code_nk FROM trip_clean
        WHERE rate_code_nk IS NOT NULL) rc
  UNION ALL SELECT -1, 'UNKNOWN'
),
dim_flag AS (
  SELECT CAST(dense_rank() OVER (ORDER BY flag_nk ASC) AS INT) AS flag_key,
         flag_nk
  FROM (SELECT DISTINCT flag_nk FROM trip_clean WHERE flag_nk IS NOT NULL) fl
  UNION ALL SELECT -1, 'UNKNOWN'
),
dim_location AS (
  SELECT CAST(dense_rank() OVER (ORDER BY location_id_nk ASC) AS INT) AS location_key,
         location_id_nk
  FROM (SELECT DISTINCT location_id_nk FROM (
          SELECT pu_loc_id AS location_id_nk FROM trip_clean
          UNION ALL
          SELECT do_loc_id FROM trip_clean) u
        WHERE location_id_nk IS NOT NULL) l
  UNION ALL SELECT -1, -1
),
fact_trip AS (
  SELECT
    sha256(
      COALESCE(UPPER(NULLIF(TRIM(t.vendor_code), '')), '') || '|' ||
      strftime(t.pickup_ts_utc, '%Y-%m-%dT%H:%M:%S.%f') || '|' ||
      strftime(t.dropoff_ts_utc, '%Y-%m-%dT%H:%M:%S.%f') || '|' ||
      CAST(CAST(t.fare_amount AS DECIMAL(18,2)) AS VARCHAR) || '|' ||
      CAST(CAST(t.trip_distance_km AS DECIMAL(18,3)) AS VARCHAR) || '|' ||
      COALESCE(UPPER(NULLIF(TRIM(t.payment_type), '')), '')
    ) AS trip_id,
    CAST(year(t.pickup_ts_utc)*10000 + month(t.pickup_ts_utc)*100
         + day(t.pickup_ts_utc) AS INT) AS pickup_date_key,
    CAST(hour(t.pickup_ts_utc)*3600 + minute(t.pickup_ts_utc)*60
         + second(t.pickup_ts_utc) AS INT) AS pickup_time_key,
    COALESCE(v.vendor_key, -1) AS vendor_key,
    COALESCE(p.payment_type_key, -1) AS payment_type_key,
    COALESCE(rc.rate_code_key, -1) AS rate_code_key,
    COALESCE(fl.flag_key, -1) AS flag_key,
    COALESCE(pu.location_key, -1) AS pu_location_key,
    COALESCE(dl.location_key, -1) AS do_location_key,
    t.trip_distance_km,
    t.fare_amount,
    t.tip_amount,
    t.is_night_ride,
    t.ingest_date,
    t.source_file_name,
    t.loaded_at
  FROM trip_clean t
  LEFT JOIN dim_vendor v ON v.vendor_code = t.vendor_code
  LEFT JOIN dim_payment p ON p.payment_type_nk = t.payment_type
  LEFT JOIN dim_rate_code rc ON rc.rate_code_nk = t.rate_code_nk
  LEFT JOIN dim_flag fl ON fl.flag_nk = t.flag_nk
  LEFT JOIN dim_location pu ON pu.location_id_nk = t.pu_loc_id
  LEFT JOIN dim_location dl ON dl.location_id_nk = t.do_loc_id
)
"""


def with_trips(select_sql: str) -> str:
    """Wrap a SELECT with the shared trips-feed CTE chain."""
    return f"WITH {TRIPS_CTES} {select_sql}"
