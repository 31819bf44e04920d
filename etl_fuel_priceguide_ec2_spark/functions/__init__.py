from etl_fuel_priceguide_ec2_spark.functions.scalar import (
    format_ts,
    json_field,
    minutes_between,
    url_for_id,
)

__all__ = ["format_ts", "json_field", "minutes_between", "url_for_id"]
