from .catalog import (
    TABLES,
    load_tables,
    read_events,
    read_jdbc,
    read_x01_text,
    register_views,
)

__all__ = [
    "TABLES",
    "load_tables",
    "read_events",
    "read_jdbc",
    "read_x01_text",
    "register_views",
]
