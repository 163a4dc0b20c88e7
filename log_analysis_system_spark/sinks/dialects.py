"""Dialect-native single-statement upserts (SURVEY §2.1 S10).

The reference's upsert is MySQL-specific: a select-then-branch in
dao/impl/AdUserClickCountDAOImpl.java:18-89 whose update arm runs
``UPDATE ad_user_click_count SET click_count = click_count + ?`` — i.e. the
canonical additive upsert. ``sinks.upsert_foreach_batch`` already executes
that shape through any DB-API connection, but the STATEMENT it needs is
per-dialect. This module generates it, so a deployment against real MySQL /
Postgres / SQLite / Derby (or any ANSI-MERGE engine) gets the single-
statement atomic form — one network round-trip per batch of rows, no
read-modify-write race, which is what the reference's two-statement version
has (two streams upserting the same key can both take the insert arm).

Semantics (all dialects identical):
- row's key absent  → insert the row;
- row's key present → for each *increment* column ``c``: ``c = c + new.c``
  (the reference's click-count arithmetic); for each *replace* column:
  ``c = new.c``.

All statements are DB-API ``qmark``-parameterized and come back as an
``UpsertStatement(sql, param_cols)`` — ``param_cols`` names the column each
``?`` binds, IN ORDER, because the order is dialect-dependent (Derby's
MERGE mentions key columns in ON before the SET/INSERT arms). Feed
``param_cols`` straight into ``upsert_foreach_batch(stmt.sql,
stmt.param_cols, conn_factory)`` / JDBC ``PreparedStatement`` — no
string-formatting of row values anywhere.
"""

from __future__ import annotations

from collections.abc import Sequence
from typing import NamedTuple

DIALECTS = ("mysql", "postgres", "sqlite", "derby")


class UpsertStatement(NamedTuple):
    sql: str
    param_cols: tuple[str, ...]


def _cols(
    key_cols: Sequence[str],
    increment_cols: Sequence[str],
    replace_cols: Sequence[str],
) -> list[str]:
    cols = [*key_cols, *increment_cols, *replace_cols]
    if len(set(cols)) != len(cols):
        raise ValueError(f"column listed twice across roles: {cols}")
    if not key_cols:
        raise ValueError("at least one key column is required")
    if not increment_cols and not replace_cols:
        raise ValueError("no non-key columns: nothing to upsert")
    return cols


def upsert_statement(
    dialect: str,
    table: str,
    key_cols: Sequence[str],
    increment_cols: Sequence[str] = (),
    replace_cols: Sequence[str] = (),
) -> UpsertStatement:
    """Return the dialect's single-statement additive upsert.

    ``increment_cols`` get ``c = c + excluded.c`` on conflict (the
    reference's ``click_count = click_count + ?``); ``replace_cols`` get
    ``c = excluded.c``. Bind parameters in ``.param_cols`` order.
    """
    cols = _cols(key_cols, increment_cols, replace_cols)
    collist = ", ".join(cols)
    qmarks = ", ".join("?" for _ in cols)

    if dialect == "mysql":
        # INSERT ... ON DUPLICATE KEY UPDATE (conflict target is implicit:
        # any PRIMARY/UNIQUE key). VALUES(c) refers to the attempted row.
        sets = [f"{c} = {c} + VALUES({c})" for c in increment_cols]
        sets += [f"{c} = VALUES({c})" for c in replace_cols]
        return UpsertStatement(
            f"INSERT INTO {table} ({collist}) VALUES ({qmarks}) "
            f"ON DUPLICATE KEY UPDATE {', '.join(sets)}",
            tuple(cols),
        )

    if dialect in ("postgres", "sqlite"):
        # Standard ON CONFLICT ... DO UPDATE with the excluded pseudo-table.
        sets = [f"{c} = {table}.{c} + excluded.{c}" for c in increment_cols]
        sets += [f"{c} = excluded.{c}" for c in replace_cols]
        keylist = ", ".join(key_cols)
        return UpsertStatement(
            f"INSERT INTO {table} ({collist}) VALUES ({qmarks}) "
            f"ON CONFLICT ({keylist}) DO UPDATE SET {', '.join(sets)}",
            tuple(cols),
        )

    if dialect == "derby":
        # Derby's MERGE source must be a base table or table function
        # (ERROR 42XAL on a VALUES derived table), so use the 1-row dummy
        # table and parameterize the ON / SET / INSERT arms directly. Every
        # ``?`` sits in a column-typed context (compared to or inserted
        # into a table column), so no explicit CASTs are needed.
        on = " AND ".join(f"t.{c} = ?" for c in key_cols)
        sets = [f"{c} = t.{c} + ?" for c in increment_cols]
        sets += [f"{c} = ?" for c in replace_cols]
        params = (*key_cols, *increment_cols, *replace_cols, *cols)
        return UpsertStatement(
            f"MERGE INTO {table} t "
            f"USING SYSIBM.SYSDUMMY1 ON {on} "
            f"WHEN MATCHED THEN UPDATE SET {', '.join(sets)} "
            f"WHEN NOT MATCHED THEN INSERT ({collist}) VALUES ({qmarks})",
            params,
        )

    raise ValueError(f"unknown dialect {dialect!r}; expected one of {DIALECTS}")
