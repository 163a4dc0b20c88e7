from .scalar import (
    date_hour_key,
    date_key,
    json_field,
    null_sentinel,
    parse_packed,
    round_half_up,
    time_minute_key,
    trim_comma,
    zero_pad,
)

__all__ = [
    "date_hour_key",
    "date_key",
    "json_field",
    "null_sentinel",
    "parse_packed",
    "round_half_up",
    "time_minute_key",
    "trim_comma",
    "zero_pad",
]
