"""Star-schema / SQL analytics layer — reference sql/02,03,10 re-expressed.

Dims + fact (CTAS semantics), views (incl. view-on-view), and the EDA query
set, all through ``spark.sql`` so Catalyst's analyzer expands views and the
optimizer owns join order. Dialect substitutions per SURVEY.md §3 EP3:
SAFE_DIVIDE→try_divide, COUNTIF→count_if, GENERATE_DATE_ARRAY→sequence,
FORMAT_DATE('%A')→date_format(...,'EEEE'), ISOWEEK→weekofyear.

``weather_id`` repair (SURVEY.md §7.4 item 4): the reference declares the
key (README.md:195,204) but never materializes it; we mint it on both sides
so EDA queries 9-11 actually run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def register_star(spark: SparkSession, fact_base: DataFrame, markets: DataFrame) -> None:
    """Build the 5 dims + re-aggregated fact + 3 views as temp views, in
    dependency order (sql/02_create_dims_and_facts.sql, sql/03_create_views.sql)."""
    fact_base.createOrReplaceTempView("fact_base")
    markets.createOrReplaceTempView("dim_market_src")

    # -- dims (sql/02:21-65) ------------------------------------------------
    spark.sql(
        """
        CREATE OR REPLACE TEMP VIEW dim_venue AS
        SELECT DISTINCT venue_id, venue, market
        FROM fact_base WHERE venue_id IS NOT NULL
        """
    )
    spark.sql(
        """
        CREATE OR REPLACE TEMP VIEW dim_market AS
        SELECT DISTINCT market, country FROM (
          SELECT m.market, m.country FROM dim_market_src m
        ) WHERE market IS NOT NULL
        """
    )
    spark.sql(
        """
        CREATE OR REPLACE TEMP VIEW dim_section AS
        SELECT DISTINCT section FROM fact_base WHERE section IS NOT NULL
        """
    )
    # dim_date via date-array generation (sql/02:57-65)
    spark.sql(
        """
        CREATE OR REPLACE TEMP VIEW dim_date AS
        SELECT day,
               year(day)  AS year,
               month(day) AS month,
               day(day)   AS day_of_month,
               date_format(day, 'EEEE') AS weekday,
               weekofyear(day) AS iso_week
        FROM (
          SELECT explode(sequence(
            (SELECT min(event_date) FROM fact_base),
            (SELECT max(event_date) FROM fact_base),
            interval 1 day)) AS day
        )
        """
    )
    # dim_weather + weather_id minting (sql/02:72-89 + §7.4 repair)
    spark.sql(
        """
        CREATE OR REPLACE TEMP VIEW dim_weather AS
        SELECT DISTINCT
          concat_ws('|', market, cast(event_date AS string)) AS weather_id,
          event_date, market, avg_temp_c, min_temp_c, max_temp_c,
          avg_rh_pct, avg_wind_mps, total_precip_mm,
          windy_hours, rainy_hours, freezing_hours, hours_observed
        FROM fact_base WHERE event_date IS NOT NULL
        """
    )
    # re-aggregated fact with weighted avg price (sql/02:97-110)
    spark.sql(
        """
        CREATE OR REPLACE TEMP VIEW fact_ticket_sales AS
        SELECT event_date, market, venue_id, venue, section,
               concat_ws('|', market, cast(event_date AS string)) AS weather_id,
               SUM(tickets_sold) AS tickets_sold,
               SUM(revenue) AS revenue,
               try_divide(SUM(revenue), nullif(SUM(tickets_sold), 0)) AS avg_price,
               any_value(section_capacity) AS section_capacity,
               try_divide(SUM(tickets_sold), nullif(any_value(section_capacity), 0)) AS utilization
        FROM fact_base
        GROUP BY 1, 2, 3, 4, 5
        """
    )

    # -- views (sql/03; view-on-view at :62) --------------------------------
    spark.sql(
        """
        CREATE OR REPLACE TEMP VIEW vw_sales_weather AS
        SELECT f.event_date, f.market, f.venue_id, f.venue, f.section,
               f.tickets_sold, f.revenue, f.avg_price, f.section_capacity,
               f.utilization,
               w.avg_temp_c, w.min_temp_c, w.max_temp_c, w.avg_rh_pct,
               w.avg_wind_mps, w.total_precip_mm,
               w.windy_hours, w.rainy_hours, w.freezing_hours
        FROM fact_ticket_sales f
        JOIN dim_venue USING (venue_id)
        LEFT JOIN dim_weather w
          ON w.market = f.market AND w.event_date = f.event_date
        """
    )
    spark.sql(
        """
        CREATE OR REPLACE TEMP VIEW vw_market_daily AS
        SELECT event_date, market,
               SUM(tickets_sold) AS tickets_sold,
               SUM(revenue) AS revenue,
               try_divide(SUM(tickets_sold), SUM(section_capacity)) AS utilization,
               any_value(avg_temp_c) AS avg_temp_c,
               any_value(total_precip_mm) AS total_precip_mm
        FROM vw_sales_weather
        GROUP BY event_date, market
        """
    )
    spark.sql(
        """
        CREATE OR REPLACE TEMP VIEW vw_venue_section_daily AS
        SELECT event_date, venue_id, venue, section,
               SUM(tickets_sold) AS tickets_sold,
               SUM(revenue) AS revenue,
               try_divide(SUM(tickets_sold), nullif(SUM(section_capacity),0)) AS utilization
        FROM vw_sales_weather
        GROUP BY event_date, venue_id, venue, section
        """
    )


# The 11 EDA queries (sql/10_eda_queries.sql) in Spark dialect, runnable
# against the views registered above. Keys are stable names for tests.
EDA_QUERIES: dict[str, str] = {
    "coverage": """
        SELECT market, venue, COUNT(DISTINCT event_date) AS event_days,
               SUM(tickets_sold) AS tickets_sold, ROUND(SUM(revenue), 2) AS revenue
        FROM vw_sales_weather GROUP BY market, venue ORDER BY market
    """,
    "rainy_vs_dry": """
        SELECT market, IF(total_precip_mm > 0, 'Rainy', 'Dry') AS day_type,
               COUNT(*) AS day_rows, ROUND(AVG(utilization) * 100, 2) AS avg_utilization_pct
        FROM vw_market_daily GROUP BY market, day_type ORDER BY market, day_type
    """,
    "temp_bands": """
        SELECT CASE
                 WHEN avg_temp_c IS NULL THEN 'Unknown'
                 WHEN avg_temp_c < -10 THEN 'Very Cold (< -10C)'
                 WHEN avg_temp_c BETWEEN -10 AND 0 THEN 'Cold (-10 to 0C)'
                 WHEN avg_temp_c BETWEEN 0 AND 5 THEN 'Cool (0 to 5C)'
                 WHEN avg_temp_c BETWEEN 5 AND 15 THEN 'Mild (5 to 15C)'
                 ELSE 'Warm (> 15C)'
               END AS temp_band,
               COUNT(*) AS day_rows,
               ROUND(AVG(utilization) * 100, 2) AS avg_utilization_pct
        FROM vw_market_daily GROUP BY temp_band ORDER BY temp_band
    """,
    "util_corr": """
        SELECT corr(utilization, avg_temp_c) AS corr_util_temp
        FROM vw_market_daily
    """,
    "top_sections": """
        SELECT venue_id, section,
               COUNT(DISTINCT event_date) AS num_events,
               ROUND(AVG(utilization) * 100, 2) AS avg_utilization_pct
        FROM vw_venue_section_daily
        GROUP BY venue_id, section
        HAVING num_events >= 3
        ORDER BY avg_utilization_pct DESC, venue_id, section
        LIMIT 20
    """,
    "sellout_rate": """
        SELECT market, count_if(utilization >= 0.95) AS sellout_days,
               COUNT(*) AS total_days,
               ROUND(count_if(utilization >= 0.95) / COUNT(*), 4) AS sellout_rate
        FROM vw_market_daily GROUP BY market ORDER BY market
    """,
    "temp_bin_util": """
        SELECT ROUND(avg_temp_c / 5) * 5 AS temp_bin,
               ROUND(AVG(utilization) * 100, 2) AS avg_utilization_pct,
               COUNT(*) AS day_rows
        FROM vw_market_daily WHERE avg_temp_c IS NOT NULL
        GROUP BY temp_bin ORDER BY temp_bin
    """,
}


def run_eda(spark: SparkSession, name: str) -> DataFrame:
    return spark.sql(EDA_QUERIES[name])
